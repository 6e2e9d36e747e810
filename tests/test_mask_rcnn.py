"""Mask R-CNN smoke + behavior tests (tiny backbone, small images).

Covers SURVEY.md §2.2's MaskRCNN inventory: train loss dict (objectness /
rpn-box / classifier / box-reg / mask), fixed-size detection output with
pasted masks, and the eval-time proposal-augmentation tracking prior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e_osvos_tpu.models import MaskRCNN, RoIConfig, RPNConfig
from e_osvos_tpu.models.fpn import FPN, upsample2x_nearest
from e_osvos_tpu.models.rpn import (
    RPNConfig as _RPNConfig,
    assign_rpn_targets,
    augment_proposals_with_targets,
    generate_anchors,
    Proposals,
)

SIZE = 64

TINY_RPN = RPNConfig(
    anchor_sizes=(8, 16, 32, 64, 128),
    pre_nms_top_n=64,
    post_nms_top_n=32,
    batch_size_per_image=32,
)
TINY_ROI = RoIConfig(batch_size_per_image=16, detections_per_img=2)


def tiny_model():
    return MaskRCNN(arch="resnet10", backbone_norm="group4",
                    rpn=TINY_RPN, roi=TINY_ROI)


@pytest.fixture(scope="module")
def model_and_vars():
    model = tiny_model()
    imgs = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        imgs,
    )
    return model, variables


class TestFPN:
    def test_upsample2x(self):
        x = jnp.arange(4.0).reshape(1, 2, 2, 1)
        up = upsample2x_nearest(x)
        assert up.shape == (1, 4, 4, 1)
        np.testing.assert_allclose(np.asarray(up[0, :2, :2, 0]), 0.0)

    def test_pyramid_shapes(self):
        from e_osvos_tpu.models.resnet import ResNet

        x = jnp.zeros((1, SIZE, SIZE, 3))
        backbone = ResNet(arch="resnet10", norm_layer="group4")
        fpn = FPN(out_ch=32)
        feats = backbone.init_with_output(jax.random.PRNGKey(0), x)[0]
        outs, _ = fpn.init_with_output(jax.random.PRNGKey(0), feats)
        sizes = [o.shape[1] for o in outs]
        assert sizes == [16, 8, 4, 2, 1]
        assert all(o.shape[-1] == 32 for o in outs)


class TestAnchorsAndTargets:
    def test_anchor_counts_and_coverage(self):
        cfg = TINY_RPN
        anchors = generate_anchors((SIZE, SIZE), cfg)
        assert len(anchors) == 5
        assert anchors[0].shape == ((SIZE // 4) ** 2 * 3, 4)
        # aspect ratios preserve area approximately
        a = anchors[0][:3]
        areas = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        np.testing.assert_allclose(areas, cfg.anchor_sizes[0] ** 2, rtol=1e-5)

    def test_rpn_target_assignment(self):
        cfg = _RPNConfig(fg_iou_thresh=0.7, bg_iou_thresh=0.3,
                         batch_size_per_image=8)
        anchors = jnp.array(
            [[0, 0, 10, 10], [0, 0, 11, 10], [50, 50, 60, 60], [30, 0, 40, 10]],
            jnp.float32,
        )
        gt = jnp.array([[0, 0, 10, 10]], jnp.float32)
        tgt = assign_rpn_targets(cfg, anchors, gt, jnp.array([True]),
                                 jax.random.PRNGKey(0))
        labels = np.asarray(tgt.labels)
        assert labels[0] == 1  # exact match
        assert labels[2] == 0  # no overlap → bg
        assert labels[3] == 0

    def test_no_gt_all_background(self):
        cfg = _RPNConfig(batch_size_per_image=4)
        anchors = jnp.array([[0, 0, 10, 10], [5, 5, 15, 15]], jnp.float32)
        gt = jnp.zeros((1, 4), jnp.float32)
        tgt = assign_rpn_targets(cfg, anchors, gt, jnp.array([False]),
                                 jax.random.PRNGKey(0))
        assert (np.asarray(tgt.labels) <= 0).all()


class TestProposalAugmentation:
    def _props(self, n=8):
        return Proposals(
            boxes=jnp.tile(jnp.array([[0.0, 0.0, 10.0, 10.0]]), (n, 1)),
            scores=jnp.full((n,), 0.5),
            valid=jnp.ones((n,), bool),
        )

    def test_replace(self):
        tb = jnp.array([[20.0, 20.0, 40.0, 40.0]])
        out = augment_proposals_with_targets(
            jax.random.PRNGKey(0), self._props(), tb, jnp.array([True]),
            "REPLACE",
        )
        b = np.asarray(out.boxes)
        # all boxes are jittered copies of the target (within ±10% of 20px)
        assert (np.abs(b - np.array([20, 20, 40, 40])) <= 2.0 + 1e-5).all()

    def test_extend_keeps_half(self):
        tb = jnp.array([[20.0, 20.0, 40.0, 40.0]])
        out = augment_proposals_with_targets(
            jax.random.PRNGKey(0), self._props(8), tb, jnp.array([True]),
            "EXTEND",
        )
        b = np.asarray(out.boxes)
        np.testing.assert_allclose(b[:4], [[0, 0, 10, 10]] * 4)
        assert (b[4:, 0] > 10).all()

    def test_none_passthrough(self):
        p = self._props()
        out = augment_proposals_with_targets(
            jax.random.PRNGKey(0), p, jnp.zeros((1, 4)), jnp.array([True]),
            "NONE",
        )
        np.testing.assert_array_equal(np.asarray(out.boxes), np.asarray(p.boxes))


class TestMaskRCNNForward:
    def test_train_returns_loss_dict(self, model_and_vars):
        model, variables = model_and_vars
        imgs = jax.random.normal(jax.random.PRNGKey(2), (1, SIZE, SIZE, 3))
        masks = np.zeros((1, 2, SIZE, SIZE), np.float32)
        masks[0, 0, 20:40, 20:40] = 1
        gt_valid = jnp.array([[True, False]])

        total, loss_dict = model.apply(
            variables, imgs, jnp.asarray(masks), gt_valid, train=True,
            rngs={"sample": jax.random.PRNGKey(3)},
        )
        expected = {"loss_objectness", "loss_rpn_box_reg", "loss_classifier",
                    "loss_box_reg", "loss_mask"}
        assert set(loss_dict) == expected
        assert np.isfinite(float(total))
        assert all(np.isfinite(float(v)) for v in loss_dict.values())

    def test_train_jit_and_grad(self, model_and_vars):
        model, variables = model_and_vars
        imgs = jax.random.normal(jax.random.PRNGKey(2), (1, SIZE, SIZE, 3))
        masks = np.zeros((1, 1, SIZE, SIZE), np.float32)
        masks[0, 0, 10:30, 10:30] = 1
        gt_valid = jnp.array([[True]])

        @jax.jit
        def loss_fn(params):
            total, _ = model.apply(
                {"params": params}, imgs, jnp.asarray(masks), gt_valid,
                train=True, rngs={"sample": jax.random.PRNGKey(3)},
            )
            return total

        g = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # box head must receive gradient
        gb = jax.tree_util.tree_leaves(g["box_head"])
        assert any(float(jnp.abs(x).max()) > 0 for x in gb)

    def test_eval_fixed_size_detections(self, model_and_vars):
        model, variables = model_and_vars
        imgs = jax.random.normal(jax.random.PRNGKey(4), (1, SIZE, SIZE, 3))
        det = model.apply(variables, imgs,
                          rngs={"sample": jax.random.PRNGKey(5)})
        K = TINY_ROI.detections_per_img
        assert det.boxes.shape == (1, K, 4)
        assert det.scores.shape == (1, K)
        assert det.masks.shape == (1, K, SIZE, SIZE)
        assert det.valid.shape == (1, K)
        m = np.asarray(det.masks)
        assert (m >= 0).all() and (m <= 1).all()

    def test_eval_with_proposal_augmentation(self, model_and_vars):
        model, variables = model_and_vars
        imgs = jax.random.normal(jax.random.PRNGKey(4), (1, SIZE, SIZE, 3))
        prev = jnp.array([[[10.0, 10.0, 40.0, 40.0]]])
        det = model.apply(
            variables, imgs, prev_boxes=prev,
            prev_valid=jnp.array([[True]]), proposal_aug_mode="EXTEND",
            rngs={"sample": jax.random.PRNGKey(5)},
        )
        assert det.boxes.shape[1] == TINY_ROI.detections_per_img


@pytest.mark.slow
class TestDetectionOneShot:
    """End-to-end detection one-shot eval on the synthetic fixture
    (fine-tune Mask R-CNN on frame 0 → propagate with box carry)."""

    def test_eval_sequence_runs(self):
        from e_osvos_tpu.data.synthetic import SyntheticVOSIndex
        from e_osvos_tpu.data.transforms import AugmentConfig
        from e_osvos_tpu.engine.one_shot_detection import (
            DetectionOneShotConfig,
            DetectionOneShotEvaluator,
        )
        from e_osvos_tpu.meta_optim import MetaOptimConfig, init_meta_params

        model = tiny_model()
        imgs = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            imgs,
        )
        meta_cfg = MetaOptimConfig(init_lr=1e-3, use_log_init_lr=False)
        meta_params = init_meta_params(meta_cfg, variables)

        cfg = DetectionOneShotConfig(
            num_epochs=2,
            batch_size=2,
            augment=AugmentConfig(scale_min=0.95, scale_max=1.05,
                                  rot_deg=5.0, flip_prob=0.0),
        )
        ev = DetectionOneShotEvaluator(model, meta_cfg, cfg)
        index = SyntheticVOSIndex(num_sequences=1, num_frames=3,
                                  size=(SIZE, SIZE), num_objects=1, seed=4)
        res = ev.eval_sequence(index, "seq00", meta_params,
                               jax.random.PRNGKey(7))
        assert res["merged"].shape == (3, SIZE, SIZE)
        assert np.isfinite(res["J_mean"]) or np.isnan(res["J_mean"])
        assert res["probs"].shape == (1, 3, SIZE, SIZE)

    def test_ona_refit_runs(self):
        from e_osvos_tpu.data.synthetic import SyntheticVOSIndex
        from e_osvos_tpu.data.transforms import AugmentConfig
        from e_osvos_tpu.engine.one_shot_detection import (
            DetectionOneShotConfig,
            DetectionOneShotEvaluator,
        )
        from e_osvos_tpu.meta_optim import MetaOptimConfig, init_meta_params

        model = tiny_model()
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            jnp.zeros((1, SIZE, SIZE, 3), jnp.float32),
        )
        meta_cfg = MetaOptimConfig(init_lr=1e-3, use_log_init_lr=False)
        meta_params = init_meta_params(meta_cfg, variables)
        cfg = DetectionOneShotConfig(
            num_epochs=1,
            batch_size=1,
            online_adapt_step=2,
            online_adapt_epochs=1,
            ona_only_box_head=True,
            augment=AugmentConfig(scale_min=1.0, scale_max=1.0, rot_deg=0.0,
                                  flip_prob=0.0, brightness=0.0,
                                  contrast=0.0, saturation=0.0),
        )
        ev = DetectionOneShotEvaluator(model, meta_cfg, cfg)
        index = SyntheticVOSIndex(num_sequences=1, num_frames=5,
                                  size=(SIZE, SIZE), num_objects=1, seed=5)
        res = ev.eval_sequence(index, "seq00", meta_params,
                               jax.random.PRNGKey(9))
        assert res["merged"].shape == (5, SIZE, SIZE)

    def test_ona_only_box_head_updates_heads_only(self):
        """only_box_head OnA refits must (a) leave every non-head parameter
        bit-identical (backbone/FPN/RPN are stop-gradient'd, so XLA skips
        their backward entirely) and (b) actually move the box/mask heads.
        Note the reference's own restriction is inert — its filter is
        `if True:` (meta_model.py:73-76) — so this is a working version of
        the switch the reference only names."""
        from e_osvos_tpu.data.synthetic import SyntheticVOSIndex
        from e_osvos_tpu.engine.one_shot_detection import (
            DetectionOneShotConfig,
            DetectionOneShotEvaluator,
        )
        from e_osvos_tpu.meta_optim import MetaOptimConfig, init_meta_params

        model = tiny_model()
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            jnp.zeros((1, SIZE, SIZE, 3), jnp.float32),
        )
        meta_cfg = MetaOptimConfig(init_lr=1e-2, use_log_init_lr=False)
        meta_params = init_meta_params(meta_cfg, variables)
        cfg = DetectionOneShotConfig(
            num_epochs=1, batch_size=1,
            online_adapt_step=2, online_adapt_epochs=2,
            ona_only_box_head=True,
        )
        ev = DetectionOneShotEvaluator(model, meta_cfg, cfg)
        index = SyntheticVOSIndex(num_sequences=1, num_frames=3,
                                  size=(SIZE, SIZE), num_objects=1, seed=5)
        img = jnp.asarray(index.get_image("seq00", 0), jnp.float32)
        label = jnp.asarray(index.get_label("seq00", 0), jnp.int32)
        prop_imgs = jnp.asarray(
            np.stack([index.get_image("seq00", 1)]), jnp.float32
        )
        prop_labels = jnp.asarray(
            np.stack([index.get_label("seq00", 1)]), jnp.int32
        )
        before = jax.tree_util.tree_map(jnp.copy, variables)
        after, _ = ev._jit_ona_ft(
            meta_params, jax.random.PRNGKey(3), img, label,
            prop_imgs, prop_labels,
            jax.tree_util.tree_map(jnp.copy, variables),
        )
        flat_b = jax.tree_util.tree_flatten_with_path(before)[0]
        flat_a = jax.tree_util.tree_flatten_with_path(after)[0]
        head_moved = False
        for (path_b, b), (_, a) in zip(flat_b, flat_a):
            name = jax.tree_util.keystr(path_b).lower()
            if "box_head" in name or "mask_head" in name:
                head_moved = head_moved or bool(jnp.any(b != a))
            else:
                assert jnp.array_equal(b, a), f"non-head leaf moved: {name}"
        assert head_moved


class TestDetectionObjectBatched:
    """Detection eval with objects as a vmap batch axis (per-object params,
    box carries, and OnA pseudo-GT in one compiled program)."""

    def _setup(self, ona):
        from e_osvos_tpu.data.synthetic import SyntheticVOSIndex
        from e_osvos_tpu.data.transforms import AugmentConfig
        from e_osvos_tpu.engine.one_shot_detection import (
            DetectionOneShotConfig,
            DetectionOneShotEvaluator,
        )
        from e_osvos_tpu.meta_optim import MetaOptimConfig, init_meta_params

        model = tiny_model()
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            jnp.zeros((1, SIZE, SIZE, 3), jnp.float32),
        )
        meta_cfg = MetaOptimConfig(init_lr=1e-3, use_log_init_lr=False)
        meta_params = init_meta_params(meta_cfg, variables)
        cfg = DetectionOneShotConfig(
            num_epochs=2, batch_size=2,
            online_adapt_step=2 if ona else 0,
            online_adapt_epochs=1,
            augment=AugmentConfig(scale_min=0.95, scale_max=1.05,
                                  rot_deg=5.0, flip_prob=0.0),
        )
        ev = DetectionOneShotEvaluator(model, meta_cfg, cfg)
        index = SyntheticVOSIndex(num_sequences=1, num_frames=4,
                                  size=(SIZE, SIZE), num_objects=2, seed=4)
        return ev, index, meta_params

    def test_batched_multi_object(self):
        ev, index, meta_params = self._setup(ona=False)
        res = ev.eval_sequence(index, "seq00", meta_params,
                               jax.random.PRNGKey(7))
        assert res["probs"].shape == (2, 4, SIZE, SIZE)
        assert res["merged"].shape == (4, SIZE, SIZE)
        assert np.isfinite(res["probs"]).all()
        gt0 = index.get_label("seq00", 0)
        np.testing.assert_array_equal(res["probs"][0, 0] > 0.5, gt0 == 1)
        np.testing.assert_array_equal(res["probs"][1, 0] > 0.5, gt0 == 2)
        # the returned label map must equal the direct argmax-merge of the
        # returned probs (regression: the packed-plane reconstruction once
        # indexed with uint8 planes — integer fancy-indexing — producing a
        # wrong merged map that shape/J assertions alone cannot catch)
        from e_osvos_tpu.engine.one_shot import merge_objects

        np.testing.assert_array_equal(
            res["merged"],
            np.asarray(merge_objects(jnp.asarray(res["probs"]), 0.5)),
        )

    @pytest.mark.slow
    def test_batched_with_ona(self):
        ev, index, meta_params = self._setup(ona=True)
        res = ev.eval_sequence(index, "seq00", meta_params,
                               jax.random.PRNGKey(7))
        assert res["probs"].shape == (2, 4, SIZE, SIZE)
        assert np.isfinite(res["probs"]).all()


class TestDetectionObjectSharded:
    """Object-axis-sharded detection eval
    (one_shot_detection.py::_install_object_sharding): sharded over the
    8-device CPU mesh must equal single-device, including the pad-to-
    shard-multiple path (2 objects → 8 shards) — the detection mirror of
    TestFrameParallelEval."""

    def _setup(self, ona, mesh=None):
        from e_osvos_tpu.data.synthetic import SyntheticVOSIndex
        from e_osvos_tpu.data.transforms import AugmentConfig
        from e_osvos_tpu.engine.one_shot_detection import (
            DetectionOneShotConfig,
            DetectionOneShotEvaluator,
        )
        from e_osvos_tpu.meta_optim import MetaOptimConfig, init_meta_params

        model = tiny_model()
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            jnp.zeros((1, SIZE, SIZE, 3), jnp.float32),
        )
        meta_cfg = MetaOptimConfig(init_lr=1e-3, use_log_init_lr=False)
        meta_params = init_meta_params(meta_cfg, variables)
        cfg = DetectionOneShotConfig(
            num_epochs=2, batch_size=2,
            online_adapt_step=2 if ona else 0,
            online_adapt_epochs=1,
            augment=AugmentConfig(scale_min=0.95, scale_max=1.05,
                                  rot_deg=5.0, flip_prob=0.0),
        )
        ev = DetectionOneShotEvaluator(model, meta_cfg, cfg, mesh=mesh)
        index = SyntheticVOSIndex(num_sequences=1, num_frames=4,
                                  size=(SIZE, SIZE), num_objects=2, seed=4)
        return ev, index, meta_params

    def test_sharded_matches_single_device(self):
        from e_osvos_tpu.parallel import make_mesh

        ev, index, meta_params = self._setup(ona=False)
        evs, _, _ = self._setup(ona=False, mesh=make_mesh())
        assert evs._shard_n == 8
        r1 = ev.eval_sequence(index, "seq00", meta_params,
                              jax.random.PRNGKey(7))
        r2 = evs.eval_sequence(index, "seq00", meta_params,
                               jax.random.PRNGKey(7))
        assert r2["probs"].shape == r1["probs"].shape == (2, 4, SIZE, SIZE)
        # tolerance note: each shard compiles a PLAIN per-object conv while
        # the single-device vmap compiles a grouped conv
        # (feature_group_count=O) — different fp32 reassociation, amplified
        # through the fine-tune gradient steps. Observed max |Δprob| ≈ 4e-3
        # at mask boundaries; an object-routing bug would be O(1) everywhere.
        np.testing.assert_allclose(r2["probs"], r1["probs"], atol=2e-2)
        merged_diff = (np.asarray(r1["merged"]) != np.asarray(r2["merged"]))
        assert merged_diff.mean() < 0.01
        assert abs(r1["J_mean"] - r2["J_mean"]) < 0.01

    @pytest.mark.slow
    def test_sharded_matches_single_device_with_ona(self):
        from e_osvos_tpu.parallel import make_mesh

        ev, index, meta_params = self._setup(ona=True)
        evs, _, _ = self._setup(ona=True, mesh=make_mesh())
        r1 = ev.eval_sequence(index, "seq00", meta_params,
                              jax.random.PRNGKey(7))
        r2 = evs.eval_sequence(index, "seq00", meta_params,
                               jax.random.PRNGKey(7))
        # OnA is chaotically divergent under compilation numerics: the
        # pseudo-GT binarization is discontinuous, so the grouped-vs-plain-
        # conv fp32 differences (see test_sharded_matches_single_device) can
        # flip boundary pixels of the pseudo label, giving genuinely
        # different refit targets. Assert statistical agreement — an
        # object-ROUTING bug would move whole-object probability mass
        # (>>2% of pixels off by O(1)), not a boundary halo.
        assert r2["probs"].shape == r1["probs"].shape
        d = np.abs(np.asarray(r1["probs"]) - np.asarray(r2["probs"]))
        assert (d > 0.3).mean() < 0.02
        merged_diff = (np.asarray(r1["merged"]) != np.asarray(r2["merged"]))
        assert merged_diff.mean() < 0.05
        assert abs(r1["J_mean"] - r2["J_mean"]) < 0.05


class TestDetectionFusedOnA:
    """Fused single-program OnA propagation for the detection path
    (one_shot_detection.py::_fused_propagate) vs the host window loop:
    identical windows, PRNG keys, box carry, pseudo-GT thresholds, and
    refit schedule (no refit after the last window), so the only numeric
    slack is the padded tail window's batching. T=6, step=2 → tail pad."""

    def _run(self, fused, num_objects, batch_objects):
        from e_osvos_tpu.data.synthetic import SyntheticVOSIndex
        from e_osvos_tpu.data.transforms import AugmentConfig
        from e_osvos_tpu.engine.one_shot_detection import (
            DetectionOneShotConfig,
            DetectionOneShotEvaluator,
        )
        from e_osvos_tpu.meta_optim import MetaOptimConfig, init_meta_params

        model = tiny_model()
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            jnp.zeros((1, SIZE, SIZE, 3), jnp.float32),
        )
        meta_cfg = MetaOptimConfig(init_lr=1e-3, use_log_init_lr=False)
        meta_params = init_meta_params(meta_cfg, variables)
        cfg = DetectionOneShotConfig(
            num_epochs=2, batch_size=2,
            online_adapt_step=2, online_adapt_epochs=1,
            augment=AugmentConfig(scale_min=0.95, scale_max=1.05,
                                  rot_deg=5.0, flip_prob=0.0),
        )
        ev = DetectionOneShotEvaluator(model, meta_cfg, cfg,
                                       batch_objects=batch_objects,
                                       fused_ona=fused)
        assert ev.fused_ona == fused
        index = SyntheticVOSIndex(num_sequences=1, num_frames=6,
                                  size=(SIZE, SIZE),
                                  num_objects=num_objects, seed=4)
        return ev.eval_sequence(index, "seq00", meta_params,
                                jax.random.PRNGKey(7))

    def test_fused_matches_host_loop(self):
        r_host = self._run(fused=False, num_objects=1, batch_objects=False)
        r_fuse = self._run(fused=True, num_objects=1, batch_objects=False)
        assert r_fuse["probs"].shape == r_host["probs"].shape
        np.testing.assert_allclose(r_fuse["probs"], r_host["probs"],
                                   atol=1e-4)
        assert abs(r_fuse["J_mean"] - r_host["J_mean"]) < 1e-3

    @pytest.mark.slow
    def test_fused_matches_host_loop_object_batched(self):
        r_host = self._run(fused=False, num_objects=2, batch_objects=True)
        r_fuse = self._run(fused=True, num_objects=2, batch_objects=True)
        assert r_fuse["probs"].shape == r_host["probs"].shape == \
            (2, 6, SIZE, SIZE)
        np.testing.assert_allclose(r_fuse["probs"], r_host["probs"],
                                   atol=1e-4)
        assert abs(r_fuse["J_mean"] - r_host["J_mean"]) < 1e-3


class TestDetectionEvalStream:
    """Pipelined serving-mode detection eval (one_shot_detection.py::
    eval_stream): per-sequence fused dispatches with overlapped uploads
    and bit-packed fetches must reproduce eval_sequence's fused path
    bit-exactly (the stream replicates its key schedule)."""

    def test_stream_matches_eval_sequence(self):
        from e_osvos_tpu.data.synthetic import SyntheticVOSIndex
        from e_osvos_tpu.data.transforms import AugmentConfig
        from e_osvos_tpu.engine.one_shot_detection import (
            DetectionOneShotConfig,
            DetectionOneShotEvaluator,
        )
        from e_osvos_tpu.meta_optim import MetaOptimConfig, init_meta_params

        model = tiny_model()
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            jnp.zeros((1, SIZE, SIZE, 3), jnp.float32),
        )
        meta_cfg = MetaOptimConfig(init_lr=1e-3, use_log_init_lr=False)
        meta_params = init_meta_params(meta_cfg, variables)
        cfg = DetectionOneShotConfig(
            num_epochs=2, batch_size=2,
            online_adapt_step=2, online_adapt_epochs=1,
            augment=AugmentConfig(scale_min=0.95, scale_max=1.05,
                                  rot_deg=5.0, flip_prob=0.0),
        )
        ev = DetectionOneShotEvaluator(model, meta_cfg, cfg,
                                       batch_objects=False, fused_ona=True)
        index = SyntheticVOSIndex(num_sequences=2, num_frames=6,
                                  size=(SIZE, SIZE), num_objects=1, seed=4)
        key = jax.random.PRNGKey(7)
        names = ["seq00", "seq01"]
        masks = ev.eval_stream(index, names, meta_params, key)
        for i, name in enumerate(names):
            res = ev.eval_sequence(
                index, name, meta_params, jax.random.fold_in(key, i)
            )
            ref = (np.asarray(res["probs"][0]) >= cfg.threshold).astype(
                np.uint8
            )
            assert masks[name].shape == ref.shape == (6, SIZE, SIZE)
            np.testing.assert_array_equal(masks[name], ref)


class TestDetectionInitJ:
    def test_eval_sequence_init(self, model_and_vars):
        """init_J for the detection path: raw init + box-carry tracking,
        no fine-tune (reference evaluate.py:123-127)."""
        from e_osvos_tpu.data import SyntheticVOSIndex
        from e_osvos_tpu.engine.one_shot_detection import (
            DetectionOneShotConfig,
            DetectionOneShotEvaluator,
        )
        from e_osvos_tpu.meta_optim import MetaOptimConfig, init_meta_params

        model, variables = model_and_vars
        meta_cfg = MetaOptimConfig(init_lr=1e-3, use_log_init_lr=False)
        meta_params = init_meta_params(meta_cfg, variables)
        cfg = DetectionOneShotConfig(num_epochs=2, batch_size=2,
                                     online_adapt_step=2)
        ev = DetectionOneShotEvaluator(model, meta_cfg, cfg)
        idx = SyntheticVOSIndex(num_sequences=1, num_frames=4,
                                size=(SIZE, SIZE), num_objects=1, seed=9)
        res = ev.eval_sequence_init(idx, "seq00", meta_params)
        assert res["seq"] == "seq00"
        assert np.isfinite(res["init_J_mean"]) or np.isnan(res["init_J_mean"])
