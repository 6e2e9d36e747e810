"""End-to-end one-shot evaluation on the synthetic moving-square fixture
(SURVEY.md §4: fine-tune + propagate + J/F without real datasets)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e_osvos_tpu.data import SyntheticVOSIndex
from e_osvos_tpu.data.transforms import AugmentConfig
from e_osvos_tpu.engine import (
    OneShotConfig,
    OneShotEvaluator,
    merge_objects,
)
from e_osvos_tpu.meta_optim import MetaOptimConfig, init_meta_params
from e_osvos_tpu.models import DeepLabV3


def tiny_model():
    return DeepLabV3(num_classes=1, arch="resnet10", backbone_norm="group4",
                     head_norm="group4")


MILD_AUG = AugmentConfig(
    scale_min=0.9, scale_max=1.1, rot_deg=10.0,
    brightness=0.05, contrast=0.05, saturation=0.05, flip_prob=0.0,
)


class TestMergeObjects:
    def test_argmax_with_bg_threshold(self):
        probs = jnp.array(
            [
                [[0.9, 0.3], [0.1, 0.6]],
                [[0.2, 0.7], [0.2, 0.4]],
            ]
        )  # [O=2,H=2,W=2]
        merged = merge_objects(probs, threshold=0.5)
        # (0,0): obj1 0.9 wins; (0,1): obj2 0.7 wins; (1,0): all < bg 0.5;
        # (1,1): obj1 0.6 beats obj2 0.4 and bg 0.5
        np.testing.assert_array_equal(
            np.asarray(merged), np.array([[1, 2], [0, 1]])
        )

    def test_all_background(self):
        probs = jnp.full((3, 2, 2), 0.1)
        merged = merge_objects(probs)
        assert (np.asarray(merged) == 0).all()


@pytest.mark.slow
class TestOneShotEndToEnd:
    def test_fine_tune_improves_j(self):
        """One-shot fine-tuning on frame 0 must segment later frames of the
        synthetic sequence better than the untrained net."""
        idx = SyntheticVOSIndex(
            num_sequences=1, num_frames=3, size=(48, 48), num_objects=1, seed=1
        )
        model = tiny_model()
        dummy = jnp.zeros((1, 48, 48, 3))
        params = model.init(jax.random.key(0), dummy)

        meta_cfg = MetaOptimConfig(init_lr=0.03, learn_model_init=True)
        meta_params = init_meta_params(meta_cfg, params)

        cfg = OneShotConfig(
            num_epochs=40, batch_size=2, loss_func="cross_entropy_and_dice",
            augment=MILD_AUG,
        )
        ev = OneShotEvaluator(
            lambda p, x: model.apply(p, x), meta_cfg, cfg
        )

        res = ev.eval_sequence(idx, "seq00", meta_params, jax.random.key(1))
        assert res["merged"].shape == (3, 48, 48)
        assert np.isfinite(res["J_mean"])
        # the square is a solid color on textured bg: 40 steps from random
        # init must beat chance clearly
        assert res["J_mean"] > 0.3

    def test_online_adaptation_runs(self):
        idx = SyntheticVOSIndex(
            num_sequences=1, num_frames=5, size=(48, 48), num_objects=1, seed=2
        )
        model = tiny_model()
        params = model.init(jax.random.key(0), jnp.zeros((1, 48, 48, 3)))
        meta_cfg = MetaOptimConfig(init_lr=0.02)
        meta_params = init_meta_params(meta_cfg, params)
        cfg = OneShotConfig(
            num_epochs=4,
            batch_size=2,
            loss_func="dice",
            online_adapt_step=2,
            online_adapt_epochs=2,
            augment=MILD_AUG,
        )
        ev = OneShotEvaluator(lambda p, x: model.apply(p, x), meta_cfg, cfg)
        res = ev.eval_sequence(idx, "seq00", meta_params, jax.random.key(3))
        assert res["merged"].shape == (5, 48, 48)
        assert np.isfinite(res["J_mean"])

    def test_multi_object_merge_shapes(self):
        idx = SyntheticVOSIndex(
            num_sequences=1, num_frames=2, size=(48, 48), num_objects=2, seed=4
        )
        model = tiny_model()
        params = model.init(jax.random.key(0), jnp.zeros((1, 48, 48, 3)))
        meta_cfg = MetaOptimConfig(init_lr=0.02)
        meta_params = init_meta_params(meta_cfg, params)
        cfg = OneShotConfig(num_epochs=2, batch_size=2, loss_func="dice",
                            augment=MILD_AUG)
        ev = OneShotEvaluator(lambda p, x: model.apply(p, x), meta_cfg, cfg)
        res = ev.eval_sequence(idx, "seq00", meta_params, jax.random.key(5))
        assert res["probs"].shape == (2, 2, 48, 48)
        assert set(np.unique(res["merged"])) <= {0, 1, 2}
        assert len(res["J_per_object"]) == 2


@pytest.mark.slow
class TestObjectBatchedEval:
    def test_batched_matches_shapes_and_is_finite(self):
        """Multi-object sequence evaluated with objects as a vmap batch axis
        (SURVEY.md §7 step 4) — one compiled program for all objects."""
        idx = SyntheticVOSIndex(
            num_sequences=1, num_frames=3, size=(48, 48), num_objects=2,
            seed=3,
        )
        model = tiny_model()
        params = model.init(jax.random.key(0), jnp.zeros((1, 48, 48, 3)))
        meta_cfg = MetaOptimConfig(init_lr=0.02)
        meta_params = init_meta_params(meta_cfg, params)
        cfg = OneShotConfig(num_epochs=3, batch_size=2, loss_func="dice",
                            augment=MILD_AUG)
        ev = OneShotEvaluator(lambda p, x: model.apply(p, x), meta_cfg, cfg,
                              batch_objects=True)
        res = ev.eval_sequence(idx, "seq00", meta_params, jax.random.key(1))
        assert res["probs"].shape == (2, 3, 48, 48)
        assert res["merged"].shape == (3, 48, 48)
        assert np.isfinite(res["probs"]).all()
        # support frame carries the GT labels exactly
        gt0 = idx.get_label("seq00", 0)
        np.testing.assert_array_equal(
            res["probs"][0, 0] > 0.5, gt0 == 1
        )
        np.testing.assert_array_equal(
            res["probs"][1, 0] > 0.5, gt0 == 2
        )

    def test_batched_with_online_adaptation(self):
        """Object-batched path with OnA enabled: the per-window re-fit is
        vmapped over objects too."""
        idx = SyntheticVOSIndex(
            num_sequences=1, num_frames=5, size=(48, 48), num_objects=2,
            seed=6,
        )
        model = tiny_model()
        params = model.init(jax.random.key(0), jnp.zeros((1, 48, 48, 3)))
        meta_cfg = MetaOptimConfig(init_lr=0.02)
        meta_params = init_meta_params(meta_cfg, params)
        cfg = OneShotConfig(num_epochs=2, batch_size=2, loss_func="dice",
                            online_adapt_step=2, online_adapt_epochs=2,
                            augment=MILD_AUG)
        ev = OneShotEvaluator(lambda p, x: model.apply(p, x), meta_cfg, cfg,
                              batch_objects=True)
        res = ev.eval_sequence(idx, "seq00", meta_params, jax.random.key(2))
        assert res["probs"].shape == (2, 5, 48, 48)
        assert np.isfinite(res["probs"]).all()
        # serial path must produce the same shapes (and both must run)
        ev_serial = OneShotEvaluator(lambda p, x: model.apply(p, x),
                                     meta_cfg, cfg, batch_objects=False)
        res_s = ev_serial.eval_sequence(idx, "seq00", meta_params,
                                        jax.random.key(2))
        assert res_s["probs"].shape == (2, 5, 48, 48)


class TestFusedOnAPropagation:
    """Fused single-program OnA (one_shot.py::propagate_windows_fused) must
    equal the host window loop: same windows, same pseudo-GT thresholds,
    same refit count (the last window never refits), tail window padded by
    frame replication. Refits are deterministic, so agreement is numeric-
    noise tight. T chosen so (T-1) is NOT a multiple of step — exercises
    the padded tail window."""

    def _run(self, fused, num_objects, batch_objects, seed=7,
             window_bucket=0):
        idx = SyntheticVOSIndex(
            num_sequences=1, num_frames=6, size=(48, 48),
            num_objects=num_objects, seed=seed,
        )
        model = tiny_model()
        params = model.init(jax.random.key(0), jnp.zeros((1, 48, 48, 3)))
        meta_cfg = MetaOptimConfig(init_lr=0.02)
        meta_params = init_meta_params(meta_cfg, params)
        cfg = OneShotConfig(num_epochs=3, batch_size=2, loss_func="dice",
                            online_adapt_step=2, online_adapt_epochs=2,
                            ona_window_bucket=window_bucket,
                            augment=MILD_AUG)
        ev = OneShotEvaluator(lambda p, x: model.apply(p, x), meta_cfg, cfg,
                              batch_objects=batch_objects, fused_ona=fused)
        assert ev.fused_ona == fused
        return ev.eval_sequence(idx, "seq00", meta_params, jax.random.key(9))

    def test_fused_matches_host_loop_single_object(self):
        r_host = self._run(fused=False, num_objects=1, batch_objects=False)
        r_fuse = self._run(fused=True, num_objects=1, batch_objects=False)
        assert r_fuse["probs"].shape == r_host["probs"].shape
        np.testing.assert_allclose(
            np.asarray(r_fuse["probs"]), np.asarray(r_host["probs"]),
            atol=1e-4,
        )
        np.testing.assert_allclose(r_fuse["J_mean"], r_host["J_mean"],
                                   atol=1e-4)

    def test_window_bucketing_is_bit_identical(self):
        """ona_window_bucket pads the window axis (bounded compile count
        for heterogeneous-length datasets); cropped outputs must equal the
        exact-window program bit-for-bit — window i's probabilities depend
        only on refits of windows < i, and refits are gated off past
        wn_real. 5 propagated frames / step 2 → wn_real=3, bucket 4 → 4."""
        r_exact = self._run(fused=True, num_objects=1, batch_objects=False)
        r_bucket = self._run(fused=True, num_objects=1, batch_objects=False,
                             window_bucket=4)
        np.testing.assert_array_equal(
            np.asarray(r_exact["probs"]), np.asarray(r_bucket["probs"])
        )

    def test_fused_matches_host_loop_object_batched(self):
        r_host = self._run(fused=False, num_objects=2, batch_objects=True)
        r_fuse = self._run(fused=True, num_objects=2, batch_objects=True)
        assert r_fuse["probs"].shape == r_host["probs"].shape == (2, 6, 48, 48)
        np.testing.assert_allclose(
            np.asarray(r_fuse["probs"]), np.asarray(r_host["probs"]),
            atol=1e-4,
        )
        merged_diff = (
            np.asarray(r_fuse["merged"]) != np.asarray(r_host["merged"])
        )
        assert merged_diff.mean() < 0.005


class TestEvalStream:
    """Pipelined serving-mode eval (one_shot.py::eval_stream): every
    sequence is one fused (fine-tune → segment → threshold → bit-pack)
    dispatch, uploads overlap compute, and the result must equal the
    per-sequence eval_sequence path bit-exactly (the stream replicates its
    key schedule)."""

    def test_stream_matches_eval_sequence(self):
        idx = SyntheticVOSIndex(num_sequences=2, num_frames=5, size=(48, 48),
                                num_objects=1, seed=3)
        model = tiny_model()
        params = model.init(jax.random.key(0), jnp.zeros((1, 48, 48, 3)))
        meta_cfg = MetaOptimConfig(init_lr=0.02)
        meta_params = init_meta_params(meta_cfg, params)
        cfg = OneShotConfig(num_epochs=3, batch_size=2, loss_func="dice",
                            augment=MILD_AUG)
        ev = OneShotEvaluator(lambda p, x: model.apply(p, x), meta_cfg, cfg)
        key = jax.random.key(11)
        names = ["seq00", "seq01"]
        masks = ev.eval_stream(idx, names, meta_params, key)
        for i, name in enumerate(names):
            res = ev.eval_sequence(
                idx, name, meta_params, jax.random.fold_in(key, i)
            )
            ref = (np.asarray(res["probs"][0]) >= cfg.threshold).astype(
                np.uint8
            )
            assert masks[name].shape == ref.shape == (5, 48, 48)
            np.testing.assert_array_equal(masks[name], ref)

    def test_stream_ona_matches_eval_sequence(self):
        """Flagship-protocol serving (VERDICT r3 item 5): the stream's
        fused (fine-tune → windowed OnA → pack) program must equal the
        per-sequence fused-OnA driver bit-exactly."""
        idx = SyntheticVOSIndex(num_sequences=2, num_frames=6, size=(48, 48),
                                num_objects=1, seed=7)
        model = tiny_model()
        params = model.init(jax.random.key(0), jnp.zeros((1, 48, 48, 3)))
        meta_cfg = MetaOptimConfig(init_lr=0.02)
        meta_params = init_meta_params(meta_cfg, params)
        cfg = OneShotConfig(num_epochs=3, batch_size=2, loss_func="dice",
                            online_adapt_step=2, online_adapt_epochs=2,
                            augment=MILD_AUG)
        ev = OneShotEvaluator(lambda p, x: model.apply(p, x), meta_cfg, cfg,
                              fused_ona=True)
        key = jax.random.key(13)
        names = ["seq00", "seq01"]
        masks = ev.eval_stream(idx, names, meta_params, key)
        for i, name in enumerate(names):
            res = ev.eval_sequence(
                idx, name, meta_params, jax.random.fold_in(key, i)
            )
            ref = (np.asarray(res["probs"][0]) >= cfg.threshold).astype(
                np.uint8
            )
            assert masks[name].shape == ref.shape == (6, 48, 48)
            np.testing.assert_array_equal(masks[name], ref)

    def test_stream_multi_object_matches_eval_sequence(self):
        """Multi-object serving: objects fine-tune as a vmapped batch axis
        and merge by argmax ON DEVICE; the streamed label map must equal
        eval_sequence's merged output bit-exactly (no OnA)."""
        idx = SyntheticVOSIndex(num_sequences=2, num_frames=4, size=(48, 48),
                                num_objects=2, seed=8)
        model = tiny_model()
        params = model.init(jax.random.key(0), jnp.zeros((1, 48, 48, 3)))
        meta_cfg = MetaOptimConfig(init_lr=0.02)
        meta_params = init_meta_params(meta_cfg, params)
        cfg = OneShotConfig(num_epochs=3, batch_size=2, loss_func="dice",
                            augment=MILD_AUG)
        ev = OneShotEvaluator(lambda p, x: model.apply(p, x), meta_cfg, cfg)
        key = jax.random.key(17)
        names = ["seq00", "seq01"]
        masks = ev.eval_stream(idx, names, meta_params, key)
        for i, name in enumerate(names):
            res = ev.eval_sequence(
                idx, name, meta_params, jax.random.fold_in(key, i)
            )
            ref = np.asarray(res["merged"]).astype(np.uint8)
            assert masks[name].shape == ref.shape == (4, 48, 48)
            assert set(np.unique(masks[name])) <= {0, 1, 2}
            np.testing.assert_array_equal(masks[name], ref)

    def test_stream_multi_object_ona_matches_eval_sequence(self):
        """The full flagship configuration — multi-object AND online
        adaptation — as one fused serving program per sequence."""
        idx = SyntheticVOSIndex(num_sequences=1, num_frames=6, size=(48, 48),
                                num_objects=2, seed=9)
        model = tiny_model()
        params = model.init(jax.random.key(0), jnp.zeros((1, 48, 48, 3)))
        meta_cfg = MetaOptimConfig(init_lr=0.02)
        meta_params = init_meta_params(meta_cfg, params)
        cfg = OneShotConfig(num_epochs=3, batch_size=2, loss_func="dice",
                            online_adapt_step=2, online_adapt_epochs=2,
                            augment=MILD_AUG)
        ev = OneShotEvaluator(lambda p, x: model.apply(p, x), meta_cfg, cfg,
                              fused_ona=True)
        key = jax.random.key(19)
        masks = ev.eval_stream(idx, ["seq00"], meta_params, key)
        res = ev.eval_sequence(
            idx, "seq00", meta_params, jax.random.fold_in(key, 0)
        )
        ref = np.asarray(res["merged"]).astype(np.uint8)
        assert masks["seq00"].shape == ref.shape == (6, 48, 48)
        np.testing.assert_array_equal(masks["seq00"], ref)


class TestFrameParallelEval:
    """Frame-axis-sharded inference (one_shot.py::_install_frame_sharding):
    sharded over the 8-device CPU mesh must equal single-device, including
    the pad-to-shard-multiple path and the full OnA sequence driver."""

    def _setup(self):
        model = tiny_model()
        params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        meta_cfg = MetaOptimConfig(init_lr=0.02)
        cfg = OneShotConfig(num_epochs=2, batch_size=2, loss_func="dice",
                            augment=MILD_AUG)
        return model, params, meta_cfg, cfg

    def test_sharded_segmentation_matches_single_device(self):
        from e_osvos_tpu.parallel import make_mesh

        model, params, meta_cfg, cfg = self._setup()
        ev = OneShotEvaluator(lambda p, x: model.apply(p, x), meta_cfg, cfg)
        evs = OneShotEvaluator(lambda p, x: model.apply(p, x), meta_cfg, cfg,
                               mesh=make_mesh())
        # T=6 is not a multiple of 8 devices — exercises the padding path
        frames = jnp.asarray(
            np.random.RandomState(0).rand(6, 32, 32, 3) * 255, jnp.float32
        )
        ref = np.asarray(ev._jit_seg(params, frames))
        shd = np.asarray(evs._jit_seg(params, frames))
        assert shd.shape == ref.shape == (6, 32, 32)
        np.testing.assert_allclose(shd, ref, rtol=1e-5, atol=1e-5)

        # object-batched variant: [O,T,H,W]
        params_o = jax.tree_util.tree_map(
            lambda x: jnp.stack([x, x * 1.01]), params
        )
        ref_o = np.asarray(ev._jit_seg_objs(params_o, frames))
        shd_o = np.asarray(evs._jit_seg_objs(params_o, frames))
        assert shd_o.shape == ref_o.shape == (2, 6, 32, 32)
        np.testing.assert_allclose(shd_o, ref_o, rtol=1e-5, atol=1e-5)

    def test_full_sequence_eval_matches(self):
        from e_osvos_tpu.parallel import make_mesh

        model, params, meta_cfg, cfg = self._setup()
        meta_params = init_meta_params(meta_cfg, params)
        idx = SyntheticVOSIndex(
            num_sequences=1, num_frames=5, size=(32, 32), num_objects=1,
            seed=4,
        )
        ev = OneShotEvaluator(lambda p, x: model.apply(p, x), meta_cfg, cfg)
        evs = OneShotEvaluator(lambda p, x: model.apply(p, x), meta_cfg, cfg,
                               mesh=make_mesh())
        r1 = ev.eval_sequence(idx, "seq00", meta_params, jax.random.key(5))
        r2 = evs.eval_sequence(idx, "seq00", meta_params, jax.random.key(5))
        np.testing.assert_array_equal(r1["merged"], r2["merged"])
        np.testing.assert_allclose(r1["J_mean"], r2["J_mean"], rtol=1e-6)


class TestInitJ:
    def test_eval_sequence_init_reports_baseline(self):
        """init_J (reference evaluate.py:123-127): J/F of the raw init."""
        idx = SyntheticVOSIndex(
            num_sequences=1, num_frames=4, size=(32, 32), num_objects=1,
            seed=6,
        )
        model = tiny_model()
        params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        meta_cfg = MetaOptimConfig(init_lr=0.02)
        meta_params = init_meta_params(meta_cfg, params)
        cfg = OneShotConfig(num_epochs=2, batch_size=2, loss_func="dice",
                            augment=MILD_AUG)
        ev = OneShotEvaluator(lambda p, x: model.apply(p, x), meta_cfg, cfg)
        res = ev.eval_sequence_init(idx, "seq00", meta_params)
        assert res["seq"] == "seq00"
        assert np.isfinite(res["init_J_mean"])
        assert np.isfinite(res["init_F_mean"])
        # explicit init_params override takes precedence over the meta init
        res2 = ev.eval_sequence_init(idx, "seq00", meta_params,
                                     init_params=params)
        assert np.isfinite(res2["init_J_mean"])


class TestResolutionBucketing:
    """pad_multiple bucketing (one_shot.py::OneShotConfig.pad_multiple):
    heterogeneous resolutions compile a bounded number of programs, and the
    scores match the unpadded run on the same frames (probs are cropped
    back to the original geometry before scoring)."""

    def _ev(self, pad_multiple, model):
        meta_cfg = MetaOptimConfig(init_lr=0.02)
        cfg = OneShotConfig(num_epochs=2, batch_size=2, loss_func="dice",
                            augment=MILD_AUG, pad_multiple=pad_multiple)
        return OneShotEvaluator(lambda p, x: model.apply(p, x), meta_cfg, cfg)

    def test_bucket_count_bounded(self):
        """Two different native resolutions that share one bucket must
        compile exactly ONE segmentation and ONE fine-tune program."""
        model = tiny_model()
        params = model.init(jax.random.key(0), jnp.zeros((1, 32, 48, 3)))
        meta_cfg = MetaOptimConfig(init_lr=0.02)
        meta_params = init_meta_params(meta_cfg, params)
        ev = self._ev(16, model)
        idx_a = SyntheticVOSIndex(num_sequences=1, num_frames=3,
                                  size=(30, 44), num_objects=1, seed=1,
                                  name_prefix="a")
        idx_b = SyntheticVOSIndex(num_sequences=1, num_frames=3,
                                  size=(28, 42), num_objects=1, seed=2,
                                  name_prefix="b")
        ra = ev.eval_sequence(idx_a, "a00", meta_params, jax.random.key(3))
        rb = ev.eval_sequence(idx_b, "b00", meta_params, jax.random.key(3))
        # scores are computed on the ORIGINAL geometry
        assert ra["merged"].shape == (3, 30, 44)
        assert rb["merged"].shape == (3, 28, 42)
        # both resolutions land in the (32, 48) bucket → one program each
        assert ev._jit_seg._cache_size() == 1
        assert ev._jit_ft._cache_size() == 1

    def test_padded_matches_unpadded_j(self):
        """Same frames, with and without bucketing: equal J (zero padding
        only perturbs the conv boundary halo, which the centered synthetic
        object never touches)."""
        model = tiny_model()
        params = model.init(jax.random.key(0), jnp.zeros((1, 32, 48, 3)))
        meta_cfg = MetaOptimConfig(init_lr=0.02)
        meta_params = init_meta_params(meta_cfg, params)
        idx = SyntheticVOSIndex(num_sequences=1, num_frames=4,
                                size=(30, 44), num_objects=1, seed=5)
        r_exact = self._ev(0, model).eval_sequence(
            idx, "seq00", meta_params, jax.random.key(7)
        )
        r_bucket = self._ev(16, model).eval_sequence(
            idx, "seq00", meta_params, jax.random.key(7)
        )
        assert r_bucket["merged"].shape == r_exact["merged"].shape
        assert abs(r_bucket["J_mean"] - r_exact["J_mean"]) < 0.02

    def test_helpers(self):
        from e_osvos_tpu.data import transforms

        assert transforms.bucket_hw(30, 44, 16) == (32, 48)
        assert transforms.bucket_hw(32, 48, 16) == (32, 48)
        frames = jnp.ones((2, 30, 44, 3))
        padded = transforms.pad_frames_to_multiple(frames, 16)
        assert padded.shape == (2, 32, 48, 3)
        assert float(padded[:, 30:].sum()) == 0.0
        lab = jnp.zeros((30, 44), jnp.int32)
        plab = transforms.pad_label_to(lab, (32, 48))
        assert plab.shape == (32, 48)
        assert int(plab[31, 0]) == 255 and int(plab[0, 47]) == 255
