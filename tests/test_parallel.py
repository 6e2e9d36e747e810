"""SPMD meta-training tests on the 8-virtual-device CPU mesh (SURVEY.md §4:
shard_map tests via xla_force_host_platform_device_count)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e_osvos_tpu.data.synthetic import SyntheticVOSIndex
from e_osvos_tpu.data.transforms import AugmentConfig
from e_osvos_tpu.engine.meta_trainer import MetaTrainConfig, MetaTrainer
from e_osvos_tpu.meta_optim import MetaOptimConfig, init_meta_params
from e_osvos_tpu.meta_optim.tasksets import (
    MetaTaskset,
    MetaTasksetConfig,
    TaskBatch,
)
from e_osvos_tpu.models import DeepLabV3
from e_osvos_tpu.parallel import (
    MetaStepConfig,
    OuterOptimConfig,
    make_mesh,
    make_meta_step,
    shard_task_batch,
)
from e_osvos_tpu.utils import MetricsLogger, load_checkpoint, save_checkpoint

MILD = AugmentConfig(scale_min=0.95, scale_max=1.05, rot_deg=5.0,
                     brightness=0.02, contrast=0.02, saturation=0.02,
                     flip_prob=0.0)

SIZE = (32, 32)


def tiny_model():
    return DeepLabV3(num_classes=1, arch="resnet10", backbone_norm="group4",
                     head_norm="group4")


@pytest.fixture(scope="module")
def setup():
    model = tiny_model()
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1,) + SIZE + (3,), jnp.float32)
    )
    index = SyntheticVOSIndex(num_sequences=3, num_frames=4, size=SIZE,
                              num_objects=1, seed=0)
    taskset = MetaTaskset(
        [index], MetaTasksetConfig(num_query_frames=1, crop_size=SIZE), seed=0
    )
    return model, params, index, taskset


class TestTaskset:
    def test_batch_shapes(self, setup):
        _, _, _, taskset = setup
        batch = taskset.sample_batch(4)
        assert batch.support_img.shape == (4,) + SIZE + (3,)
        assert batch.support_label.shape == (4,) + SIZE
        assert batch.query_imgs.shape == (4, 1) + SIZE + (3,)
        assert batch.query_labels.shape == (4, 1) + SIZE
        assert batch.seeds.shape == (4,)
        assert set(np.unique(batch.support_label)) <= {0, 1, 255}

    def test_deterministic_given_seed(self, setup):
        _, _, index, _ = setup
        cfg = MetaTasksetConfig(num_query_frames=1, crop_size=SIZE)
        b1 = MetaTaskset([index], cfg, seed=7).sample_batch(2)
        b2 = MetaTaskset([index], cfg, seed=7).sample_batch(2)
        np.testing.assert_array_equal(b1.support_img, b2.support_img)
        np.testing.assert_array_equal(b1.seeds, b2.seeds)

    def test_query_differs_from_support(self, setup):
        _, _, _, taskset = setup
        for _ in range(5):
            spec = taskset.sample_spec()
            assert all(q != spec.support_frame for q in spec.query_frames)

    def test_augment_copy_paste_composites_donor_object(self, setup):
        """AUGMENT_ALL pastes a donor sequence's object over the task frames
        as a label-0 distractor (reference meta_tasksets.py:79-96 →
        vos_dataset.py:346-431): the composited support frame must contain
        pixels from TWO different sequences."""
        _, _, index, _ = setup
        cfg = MetaTasksetConfig(
            num_query_frames=1, crop_size=SIZE,
            single_obj_seq_mode="AUGMENT_ALL",
        )
        ts = MetaTaskset([index], cfg, seed=3)
        spec = ts.sample_spec()
        assert spec.donor is not None
        assert spec.donor[0] != spec.seq  # two different sequences
        batch = ts.materialize([spec])
        plain = ts.materialize([spec._replace(donor=None)])
        # compositing changed pixels, and changed pixels are labeled 0
        changed = np.any(batch.support_img[0] != plain.support_img[0], axis=-1)
        assert changed.any()
        assert (batch.support_label[0][changed] == 0).all()
        # the true object survives (partially) as label 1
        assert (batch.support_label[0] == 1).any()
        # query frames are composited too
        q_changed = np.any(
            batch.query_imgs[0, 0] != plain.query_imgs[0, 0], axis=-1
        )
        assert q_changed.any()

    def test_augment_single_only_hits_single_object_seqs(self):
        idx = SyntheticVOSIndex(num_sequences=2, num_frames=3, size=SIZE,
                                num_objects=2, seed=1)
        single = SyntheticVOSIndex(num_sequences=2, num_frames=3, size=SIZE,
                                   num_objects=1, seed=2, name_prefix="single")
        cfg = MetaTasksetConfig(
            num_query_frames=1, crop_size=SIZE,
            single_obj_seq_mode="AUGMENT_SINGLE",
        )
        ts = MetaTaskset([idx, single], cfg, seed=0)
        for _ in range(20):
            spec = ts.sample_spec()
            seq_groups = ts._index_for(spec.seq).sequences[spec.seq].object_groups
            if len(seq_groups) == 1:
                assert spec.donor is not None and spec.donor[0] != spec.seq
            else:
                assert spec.donor is None

    def test_paste_distractor_unit(self):
        from e_osvos_tpu.meta_optim.tasksets import paste_distractor

        img = np.zeros((16, 16, 3), np.float32)
        label = np.zeros((16, 16), np.int32)
        label[2:10, 2:10] = 1  # current object, box center (6,6)
        donor_img = np.full((16, 16, 3), 200.0, np.float32)
        donor_mask = np.zeros((16, 16), bool)
        donor_mask[5:9, 5:9] = True  # 4x4 donor object
        out_img, out_label = paste_distractor(img, label, donor_img, donor_mask)
        # pasted at the current box center, donor RGB + label 0
        assert (out_img[6:10, 6:10] == 200.0).all()
        assert (out_label[6:10, 6:10] == 0).all()
        # the rest of the object survives
        assert (out_label[2:6, 2:6] == 1).all()
        # empty current mask → zeroed label (reference has_label fallback)
        _, z = paste_distractor(img, np.zeros_like(label), donor_img, donor_mask)
        assert (z == 0).all()


class TestShardedMetaStep:
    @pytest.mark.parametrize("n_tasks", [4, 8])
    def test_step_runs_and_updates(self, setup, n_tasks):
        model, params, _, taskset = setup
        mesh = make_mesh(num_tasks=n_tasks)
        meta_cfg = MetaOptimConfig(init_lr=1e-3, use_log_init_lr=False)
        step = make_meta_step(
            model.apply,
            meta_cfg,
            MetaStepConfig(num_epochs=2, bptt_epochs=2, train_batch_size=2,
                           remat=False, augment=MILD),
            OuterOptimConfig(model_init_lr=1e-4, log_init_lr_lr=1e-4),
            mesh,
            meta_batch_size=n_tasks,
        )
        mp = init_meta_params(meta_cfg, params)
        opt_state = step.init(mp)
        batch = shard_task_batch(mesh, taskset.sample_batch(n_tasks))
        out = step(mp, opt_state, batch)
        assert np.isfinite(float(out.meta_loss))
        assert out.per_task_loss.shape == (n_tasks,)
        assert out.train_losses.shape == (n_tasks, 2)
        # meta-params actually moved
        before = jax.tree_util.tree_leaves(mp.log_init_lr)[0]
        after = jax.tree_util.tree_leaves(out.meta_params.log_init_lr)[0]
        assert not np.allclose(np.asarray(before), np.asarray(after))

    def test_sharded_matches_single_device(self, setup):
        """The psum-reduced sharded step must produce the same update as the
        same batch on a 1-shard mesh (allreduce correctness)."""
        model, params, _, taskset = setup
        meta_cfg = MetaOptimConfig(init_lr=1e-3, use_log_init_lr=False)
        step_cfg = MetaStepConfig(num_epochs=2, bptt_epochs=2,
                                  train_batch_size=2, remat=False,
                                  augment=MILD)
        outer = OuterOptimConfig(model_init_lr=1e-4, log_init_lr_lr=1e-4)
        batch_np = taskset.sample_batch(4)
        results = []
        for n_shards in (1, 4):
            mesh = make_mesh(num_tasks=n_shards,
                             devices=jax.devices()[:n_shards])
            step = make_meta_step(model.apply, meta_cfg, step_cfg, outer,
                                  mesh, meta_batch_size=4)
            mp = init_meta_params(meta_cfg, params)
            opt_state = step.init(mp)
            batch = shard_task_batch(mesh, batch_np)
            out = step(mp, opt_state, batch)
            results.append(out)
        np.testing.assert_allclose(
            float(results[0].meta_loss), float(results[1].meta_loss), rtol=1e-5
        )
        l0 = jax.tree_util.tree_leaves(results[0].meta_params.model_init)[0]
        l1 = jax.tree_util.tree_leaves(results[1].meta_params.model_init)[0]
        np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                                   rtol=1e-4, atol=1e-7)

    def test_frame_transform_per_task_mode(self, setup):
        """Reference-parity per-task augmentation: support augmented once
        (effective train batch 1), queries augmented with shared flip/color
        (meta.yaml random_frame_transform_per_task, default True upstream).
        The step must run, move meta-params, and differ from per-step mode."""
        model, params, _, taskset = setup
        mesh = make_mesh(num_tasks=2)
        meta_cfg = MetaOptimConfig(init_lr=1e-3, use_log_init_lr=False)
        outer = OuterOptimConfig(model_init_lr=1e-4, log_init_lr_lr=1e-4)
        batch_np = taskset.sample_batch(2)
        outs = []
        for per_task in (True, False):
            step = make_meta_step(
                model.apply,
                meta_cfg,
                MetaStepConfig(num_epochs=2, bptt_epochs=2,
                               train_batch_size=2, remat=False, augment=MILD,
                               frame_transform_per_task=per_task),
                outer,
                mesh,
                meta_batch_size=2,
            )
            mp = init_meta_params(meta_cfg, params)
            opt_state = step.init(mp)
            out = step(mp, opt_state, shard_task_batch(mesh, batch_np))
            assert np.isfinite(float(out.meta_loss))
            outs.append(out)
        before = jax.tree_util.tree_leaves(
            init_meta_params(meta_cfg, params).log_init_lr
        )[0]
        after = jax.tree_util.tree_leaves(outs[0].meta_params.log_init_lr)[0]
        assert not np.allclose(np.asarray(before), np.asarray(after))
        # different augmentation semantics -> different meta objective
        assert float(outs[0].meta_loss) != pytest.approx(
            float(outs[1].meta_loss)
        )

    def test_divisibility_assert(self, setup):
        model, params, _, _ = setup
        mesh = make_mesh(num_tasks=8)
        with pytest.raises(ValueError, match="divisible"):
            make_meta_step(
                model.apply,
                MetaOptimConfig(),
                MetaStepConfig(),
                OuterOptimConfig(),
                mesh,
                meta_batch_size=6,
            )


class TestMetaTrainer:
    def test_loss_decreases_and_checkpoint_roundtrip(self, setup, tmp_path):
        model, params, _, taskset = setup
        mesh = make_mesh(num_tasks=4)
        trainer = MetaTrainer(
            model_apply=model.apply,
            init_params=params,
            taskset=taskset,
            meta_cfg=MetaOptimConfig(init_lr=1e-2, use_log_init_lr=False),
            step_cfg=MetaStepConfig(num_epochs=2, bptt_epochs=2,
                                    train_batch_size=2, remat=False,
                                    augment=MILD),
            outer_cfg=OuterOptimConfig(model_init_lr=1e-3,
                                       log_init_lr_lr=1e-3),
            train_cfg=MetaTrainConfig(meta_batch_size=4, num_meta_iters=6,
                                      vis_interval=3,
                                      save_dir=str(tmp_path),
                                      increase_seed_per_meta_run=False),
            mesh=mesh,
            logger=MetricsLogger(path=str(tmp_path / "m.jsonl"), echo=False),
        )
        first = trainer.run(1)["meta_loss"]
        last = trainer.run(5)["meta_loss"]
        assert np.isfinite(first) and np.isfinite(last)
        assert last < first  # learned optimizer is learning

        # checkpoint roundtrip restores meta-params + outer state + counters
        trainer.save("last_meta_iter")
        fresh = MetaTrainer(
            model_apply=model.apply,
            init_params=params,
            taskset=taskset,
            meta_cfg=MetaOptimConfig(init_lr=1e-2, use_log_init_lr=False),
            step_cfg=MetaStepConfig(num_epochs=2, bptt_epochs=2,
                                    train_batch_size=2, remat=False,
                                    augment=MILD),
            outer_cfg=OuterOptimConfig(model_init_lr=1e-3,
                                       log_init_lr_lr=1e-3),
            train_cfg=MetaTrainConfig(meta_batch_size=4,
                                      increase_seed_per_meta_run=False),
            mesh=mesh,
            logger=MetricsLogger(echo=False),
        )
        fresh.restore(str(tmp_path / "last_meta_iter.ckpt"))
        assert fresh.meta_iter == trainer.meta_iter
        a = jax.tree_util.tree_leaves(trainer.meta_params.log_init_lr)[0]
        b = jax.tree_util.tree_leaves(fresh.meta_params.log_init_lr)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # metrics jsonl written
        assert (tmp_path / "m.jsonl").read_text().count("meta_train") >= 2


@pytest.mark.slow
class TestDetectionMetaStep:
    """Meta-training the DETECTION family (Mask R-CNN, the reference's
    default architecture) through the same SPMD step via task_fns
    injection."""

    def test_detection_meta_step_runs(self):
        from e_osvos_tpu.models import MaskRCNN, RoIConfig, RPNConfig
        from e_osvos_tpu.parallel.meta_step import detection_task_fns

        model = MaskRCNN(
            arch="resnet10", backbone_norm="group4",
            rpn=RPNConfig(anchor_sizes=(8, 16, 32, 64, 128),
                          pre_nms_top_n=32, post_nms_top_n=16,
                          batch_size_per_image=16),
            roi=RoIConfig(batch_size_per_image=8, detections_per_img=1),
        )
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            jnp.zeros((1,) + SIZE + (3,), jnp.float32),
        )
        index = SyntheticVOSIndex(num_sequences=2, num_frames=3, size=SIZE,
                                  num_objects=1, seed=9)
        taskset = MetaTaskset(
            [index], MetaTasksetConfig(num_query_frames=1, crop_size=SIZE),
            seed=0,
        )
        mesh = make_mesh(num_tasks=2, devices=jax.devices()[:2])
        meta_cfg = MetaOptimConfig(init_lr=1e-3, use_log_init_lr=False)
        step_cfg = MetaStepConfig(num_epochs=1, bptt_epochs=1,
                                  train_batch_size=1, remat=False,
                                  augment=MILD)
        step = make_meta_step(
            model.apply,  # unused when task_fns given, kept for signature
            meta_cfg,
            step_cfg,
            OuterOptimConfig(model_init_lr=1e-5, log_init_lr_lr=1e-5),
            mesh,
            meta_batch_size=2,
            task_fns=detection_task_fns(model, step_cfg),
        )
        mp = init_meta_params(meta_cfg, variables)
        opt_state = step.init(mp)
        batch = shard_task_batch(mesh, taskset.sample_batch(2))
        out = step(mp, opt_state, batch)
        assert np.isfinite(float(out.meta_loss))
        assert out.per_task_loss.shape == (2,)

    def test_query_loss_key_varies_roi_sampling(self):
        """The detection query pass must consume a PER-TASK key (round 1
        used a constant PRNGKey(0) at the query loss, VERDICT r1 weak #5):
        different keys → different sampled ROIs → different losses."""
        from e_osvos_tpu.models import MaskRCNN, RoIConfig, RPNConfig
        from e_osvos_tpu.parallel.meta_step import (
            MetaStepConfig,
            detection_task_fns,
        )

        model = MaskRCNN(
            arch="resnet10", backbone_norm="group4",
            rpn=RPNConfig(anchor_sizes=(8, 16, 32, 64, 128),
                          pre_nms_top_n=32, post_nms_top_n=16,
                          batch_size_per_image=16),
            # low fg threshold so random-init proposals (not only the
            # appended GT boxes, whose regression targets are all-zero and
            # hence permutation-invariant) become box-head positives
            roi=RoIConfig(batch_size_per_image=8, detections_per_img=1,
                          fg_iou_thresh=0.05, bg_iou_thresh=0.05),
        )
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            jnp.zeros((1,) + SIZE + (3,), jnp.float32),
        )
        _, query_loss_fn = detection_task_fns(
            model, MetaStepConfig(train_batch_size=1, remat=False)
        )
        rs = np.random.RandomState(3)
        img = jnp.asarray(rs.rand(1, *SIZE, 3) * 255, jnp.float32)
        label = jnp.zeros((1,) + SIZE, jnp.int32).at[:, 8:20, 6:22].set(1)
        eye = jnp.arange(4, dtype=jnp.int32)
        f = jax.jit(query_loss_fn)
        l0 = f(variables, (jax.random.PRNGKey(5), img, label, eye))
        l1 = f(variables, (jax.random.PRNGKey(11), img, label, eye))
        assert np.isfinite(float(l0)) and np.isfinite(float(l1))
        assert float(l0) != float(l1)
        # box_coord_perm task randomization: permuting the regression-target
        # coordinates changes the loss (reference random_box_coord_perm)
        swapped = jnp.asarray([1, 0, 3, 2], jnp.int32)
        l2 = f(variables, (jax.random.PRNGKey(5), img, label, swapped))
        assert float(l2) != float(l0)
