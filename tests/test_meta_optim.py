"""Learned-optimizer core tests (SURVEY.md §4: golden-value tests on a tiny
synthetic task; lr-tree shape/clamp unit tests)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e_osvos_tpu.meta_optim import (
    MetaOptimConfig,
    clamp_meta_params,
    fine_tune,
    init_lr_tree,
    init_meta_params,
    lr_stats,
    materialize_lrs,
    meta_grads,
    meta_loss,
)


# ---- a tiny quadratic task: params {'w': (2,3), 'b': (3,)} ; loss = mse ----


def make_task(key):
    kw, kx = jax.random.split(key)
    w_true = jax.random.normal(kw, (2, 3))
    x = jax.random.normal(kx, (8, 2))
    y = x @ w_true + 0.1
    return {"x": x, "y": y}


def loss_fn(params, batch):
    pred = batch["x"] @ params["w"] + params["b"]
    return jnp.mean((pred - batch["y"]) ** 2)


@pytest.fixture(scope="module")
def params():
    return {
        "w": jnp.zeros((2, 3)),
        "b": jnp.zeros((3,)),
    }


class TestLrTree:
    def test_neuron_shapes(self, params):
        lrs = init_lr_tree(params, "neuron", init_lr=1e-3)
        assert lrs["w"].shape == (1, 3)
        assert lrs["b"].shape == (3,)

    def test_tensor_shapes(self, params):
        lrs = init_lr_tree(params, "tensor")
        assert lrs["w"].shape == ()
        assert lrs["b"].shape == ()

    def test_param_shapes(self, params):
        lrs = init_lr_tree(params, "param")
        assert lrs["w"].shape == (2, 3)

    def test_log_init_value_and_materialize(self, params):
        lrs = init_lr_tree(params, "neuron", init_lr=1e-3, use_log=True)
        np.testing.assert_allclose(np.asarray(lrs["b"]), math.log(1e-3))
        mat = materialize_lrs(lrs, use_log=True)
        np.testing.assert_allclose(np.asarray(mat["b"]), 1e-3, rtol=1e-5)

    def test_clamp(self, params):
        cfg = MetaOptimConfig(max_lr=0.1)
        mp = init_meta_params(cfg, params)
        huge = jax.tree_util.tree_map(lambda x: x + 100.0, mp.log_init_lr)
        mp = mp._replace(log_init_lr=huge)
        mp = clamp_meta_params(cfg, mp)
        mat = materialize_lrs(mp.log_init_lr)
        assert float(jnp.max(mat["w"])) <= 0.1 + 1e-6

    def test_stats(self, params):
        lrs = init_lr_tree(params, "neuron", init_lr=1e-3)
        s = lr_stats(lrs)
        np.testing.assert_allclose(float(s["mean"]), 1e-3, rtol=1e-5)
        np.testing.assert_allclose(float(s["std"]), 0.0, atol=1e-8)


def stacked_batches(task, n):
    return jax.tree_util.tree_map(lambda x: jnp.stack([x] * n), task)


class TestFineTune:
    def test_loss_decreases(self, params):
        cfg = MetaOptimConfig(init_lr=0.05, learn_model_init=True)
        mp = init_meta_params(cfg, params)
        task = make_task(jax.random.key(0))
        batches = stacked_batches(task, 20)
        final, losses = jax.jit(
            lambda mp, b: fine_tune(cfg, loss_fn, mp, b)
        )(mp, batches)
        assert float(losses[-1]) < float(losses[0])
        assert final["w"].shape == (2, 3)

    def test_matches_manual_sgd(self, params):
        """Golden check: with tensor-level lrs the scan must equal hand-rolled
        SGD with lr=exp(log_lr)."""
        cfg = MetaOptimConfig(
            init_lr=0.05, lr_hierarchy_level="tensor", learn_model_init=True
        )
        mp = init_meta_params(cfg, params)
        task = make_task(jax.random.key(1))
        batches = stacked_batches(task, 5)
        final, _ = fine_tune(cfg, loss_fn, mp, batches)

        p = params
        for _ in range(5):
            g = jax.grad(loss_fn)(p, task)
            p = jax.tree_util.tree_map(lambda a, b: a - 0.05 * b, p, g)
        np.testing.assert_allclose(
            np.asarray(final["w"]), np.asarray(p["w"]), rtol=2e-5, atol=1e-6
        )

    def test_early_stopping_freezes(self, params):
        """With a huge lr the loss diverges; the patience latch must freeze
        params and report +inf for post-stop steps."""
        cfg = MetaOptimConfig(init_lr=50.0, learn_model_init=True)
        mp = init_meta_params(cfg, params)
        task = make_task(jax.random.key(2))
        batches = stacked_batches(task, 15)
        _, losses = fine_tune(
            cfg, loss_fn, mp, batches, early_stop_patience=3
        )
        assert np.isinf(np.asarray(losses)).any()

    def test_patience_zero_fast_path_matches_latch_path(self, params):
        """early_stop_patience=0 takes a latch-free scan (no per-step
        full-tree select); it must be numerically identical to the latch
        path with a patience that can never trigger."""
        cfg = MetaOptimConfig(init_lr=0.05, learn_model_init=True)
        mp = init_meta_params(cfg, params)
        task = make_task(jax.random.key(4))
        batches = stacked_batches(task, 8)
        fast_p, fast_l = fine_tune(cfg, loss_fn, mp, batches,
                                   early_stop_patience=0)
        latch_p, latch_l = fine_tune(cfg, loss_fn, mp, batches,
                                     early_stop_patience=10_000)
        np.testing.assert_allclose(
            np.asarray(fast_l), np.asarray(latch_l), rtol=1e-6
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6
            ),
            fast_p, latch_p,
        )

    def test_no_learned_init_uses_caller_params(self):
        cfg = MetaOptimConfig(learn_model_init=False, init_lr=1e-9)
        start = {"w": jnp.full((2, 3), 7.0), "b": jnp.zeros((3,))}
        mp = init_meta_params(cfg, start)
        assert mp.model_init is None
        task = make_task(jax.random.key(3))
        final, _ = fine_tune(
            cfg, loss_fn, mp, stacked_batches(task, 1), init_params=start
        )
        np.testing.assert_allclose(np.asarray(final["w"]), 7.0, rtol=1e-4)


class TestMetaGradients:
    def test_meta_grads_nonzero_for_lrs_and_init(self, params):
        cfg = MetaOptimConfig(init_lr=0.05)
        mp = init_meta_params(cfg, params)
        task = make_task(jax.random.key(4))
        batches = stacked_batches(task, 4)
        loss, grads, _ = jax.jit(
            lambda mp: meta_grads(cfg, loss_fn, loss_fn, mp, batches, task, bptt_epochs=2)
        )(mp)
        assert np.isfinite(float(loss))
        assert float(jnp.abs(grads.log_init_lr["w"]).max()) > 0
        assert float(jnp.abs(grads.model_init["w"]).max()) > 0

    def test_first_vs_second_order_differ(self, params):
        task = make_task(jax.random.key(5))
        batches = stacked_batches(task, 4)
        out = {}
        for so in (False, True):
            cfg = MetaOptimConfig(init_lr=0.05, second_order_gradients=so)
            mp = init_meta_params(cfg, params)
            _, g, _ = meta_grads(cfg, loss_fn, loss_fn, mp, batches, task, bptt_epochs=4)
            out[so] = np.asarray(g.model_init["w"])
        assert not np.allclose(out[False], out[True])

    def test_truncation_blocks_init_grads_after_first_segment(self, params):
        """With bptt truncation, the learned init's gradient must equal the
        gradient from the FIRST segment only: compare 2 segments of 2 steps
        vs a run where later query losses are simply absent."""
        cfg = MetaOptimConfig(init_lr=0.05)
        mp = init_meta_params(cfg, params)
        task = make_task(jax.random.key(6))

        # full: 4 steps, segments of 2 → init grads only from segment 1
        _, g_full, _ = meta_grads(cfg, loss_fn, loss_fn, mp, stacked_batches(task, 4), task, bptt_epochs=2)
        # first segment alone: 2 steps, one segment
        _, g_seg1, _ = meta_grads(cfg, loss_fn, loss_fn, mp, stacked_batches(task, 2), task, bptt_epochs=2)
        # meta_loss divides by num segments (2 vs 1) → scale
        np.testing.assert_allclose(
            np.asarray(g_full.model_init["w"]) * 2.0,
            np.asarray(g_seg1.model_init["w"]),
            rtol=1e-4,
            atol=1e-7,
        )

    def test_nan_guard_zeroes_grads(self, params):
        cfg = MetaOptimConfig(init_lr=jnp.nan)
        mp = init_meta_params(cfg, params)
        task = make_task(jax.random.key(7))
        loss, grads, _ = meta_grads(cfg, loss_fn, loss_fn, mp, stacked_batches(task, 2), task)
        assert not np.isfinite(float(loss))
        assert float(jnp.abs(grads.log_init_lr["w"]).max()) == 0.0

    def test_meta_loss_improves_after_outer_steps(self, params):
        """End-to-end sanity: a few outer gradient steps on (init, lrs) must
        reduce the meta loss — the core claim of the algorithm."""
        import optax

        cfg = MetaOptimConfig(init_lr=0.01)
        mp = init_meta_params(cfg, params)
        task = make_task(jax.random.key(8))
        batches = stacked_batches(task, 4)

        opt = optax.radam(1e-2)
        opt_state = opt.init(mp)

        @jax.jit
        def outer_step(mp, opt_state):
            loss, grads, _ = meta_grads(cfg, loss_fn, loss_fn, mp, batches, task, bptt_epochs=2)
            updates, opt_state = opt.update(grads, opt_state, mp)
            mp = optax.apply_updates(mp, updates)
            mp = clamp_meta_params(cfg, mp)
            return mp, opt_state, loss

        losses = []
        for _ in range(30):
            mp, opt_state, l = outer_step(mp, opt_state)
            losses.append(float(l))
        assert losses[-1] < losses[0]


class TestLrMasking:
    """Partial-update switches as lr masking (only_box_head /
    freeze_encoder, meta_optim.py:209-210, train_meta.py:110-127)."""

    def test_keep_matching_zeroes_rest(self):
        from e_osvos_tpu.meta_optim import mask_lrs_by_path

        lrs = {"backbone": {"w": jnp.ones((3,))}, "box_head": {"w": jnp.ones((2,))}}
        out = mask_lrs_by_path(lrs, ["box_head"], keep_matching=True)
        assert float(out["backbone"]["w"].max()) == 0.0
        assert float(out["box_head"]["w"].min()) == 1.0

    def test_freeze_matching(self):
        from e_osvos_tpu.meta_optim import mask_lrs_by_path

        lrs = {"backbone": {"w": jnp.ones((3,))}, "head": {"w": jnp.ones((2,))}}
        out = mask_lrs_by_path(lrs, ["backbone"], keep_matching=False)
        assert float(out["backbone"]["w"].max()) == 0.0
        assert float(out["head"]["w"].min()) == 1.0


class TestMultiStepBpttWeights:
    """multi_step_bptt_loss parity (cfgs/meta.yaml:19): per-segment weights
    on the accumulated query losses."""

    def test_uniform_weights_match_default(self, params):
        from e_osvos_tpu.meta_optim.meta_optimizer import meta_loss

        cfg = MetaOptimConfig(init_lr=0.05)
        mp = init_meta_params(cfg, params)
        task = make_task(jax.random.key(11))
        batches = stacked_batches(task, 4)
        base, _ = meta_loss(cfg, loss_fn, loss_fn, mp, batches, task,
                            bptt_epochs=2)
        # uniform weights (0.5, 0.5) scaled by num_segments == default
        w, _ = meta_loss(cfg, loss_fn, loss_fn, mp, batches, task,
                         bptt_epochs=2, segment_weights=(0.5, 0.5))
        np.testing.assert_allclose(float(base), float(w), rtol=1e-6)

    def test_weighting_shifts_loss(self, params):
        from e_osvos_tpu.meta_optim.meta_optimizer import meta_loss

        cfg = MetaOptimConfig(init_lr=0.05)
        mp = init_meta_params(cfg, params)
        task = make_task(jax.random.key(12))
        batches = stacked_batches(task, 4)
        early, _ = meta_loss(cfg, loss_fn, loss_fn, mp, batches, task,
                             bptt_epochs=2, segment_weights=(1.0, 0.0))
        late, _ = meta_loss(cfg, loss_fn, loss_fn, mp, batches, task,
                            bptt_epochs=2, segment_weights=(0.0, 1.0))
        assert float(early) != float(late)

    def test_length_mismatch_raises(self, params):
        from e_osvos_tpu.meta_optim.meta_optimizer import meta_loss

        cfg = MetaOptimConfig(init_lr=0.05)
        mp = init_meta_params(cfg, params)
        task = make_task(jax.random.key(13))
        with pytest.raises(ValueError, match="segment_weights"):
            meta_loss(cfg, loss_fn, loss_fn, mp, stacked_batches(task, 4),
                      task, bptt_epochs=2, segment_weights=(1.0,))


class TestSecondOrderSubtrees:
    """Selective second-order gradients (reference limits create_graph to
    roi_heads, meta_optim.py:195-199 + mask_rcnn.py:536-544)."""

    def test_subset_between_first_and_full_second_order(self, params):
        task = make_task(jax.random.key(21))
        batches = stacked_batches(task, 4)
        grads = {}
        for name, cfg in {
            "first": MetaOptimConfig(init_lr=0.05,
                                     second_order_gradients=False),
            "full": MetaOptimConfig(init_lr=0.05,
                                    second_order_gradients=True),
            "w_only": MetaOptimConfig(init_lr=0.05,
                                      second_order_gradients=True,
                                      second_order_subtrees=("w",)),
        }.items():
            mp = init_meta_params(cfg, params)
            _, g, _ = meta_grads(cfg, loss_fn, loss_fn, mp, batches, task,
                                 bptt_epochs=4)
            grads[name] = g
        # the subset mode is a distinct point between the two extremes
        # (detaching b's inner grads cuts cross-terms, so even w differs
        # from full second order)
        assert not np.allclose(
            np.asarray(grads["w_only"].model_init["b"]),
            np.asarray(grads["full"].model_init["b"]),
        )
        assert not np.allclose(
            np.asarray(grads["w_only"].model_init["w"]),
            np.asarray(grads["first"].model_init["w"]),
        )
        # naming every subtree recovers full second order exactly
        cfg_all = MetaOptimConfig(init_lr=0.05, second_order_gradients=True,
                                  second_order_subtrees=("w", "b"))
        mp = init_meta_params(cfg_all, params)
        _, g_all, _ = meta_grads(cfg_all, loss_fn, loss_fn, mp, batches,
                                 task, bptt_epochs=4)
        np.testing.assert_allclose(
            np.asarray(g_all.model_init["w"]),
            np.asarray(grads["full"].model_init["w"]),
            rtol=1e-6,
        )


class TestFrozenCollections:
    def test_constants_get_zero_lr(self):
        """Full flax variables dicts: 'constants' (frozen-BN stats) must
        never be updated by the inner SGD."""
        variables = {
            "params": {"w": jnp.ones((2, 3))},
            "constants": {"scale": jnp.ones((3,))},
        }
        cfg = MetaOptimConfig(init_lr=0.1, use_log_init_lr=False)
        mp = init_meta_params(cfg, variables)
        assert float(mp.log_init_lr["constants"]["scale"].max()) == 0.0
        assert float(mp.log_init_lr["params"]["w"].min()) == pytest.approx(0.1)


class TestLrPerTensor:
    def test_keys_and_values(self):
        from e_osvos_tpu.meta_optim import init_lr_tree, lr_per_tensor

        params = {"params": {"conv": {"kernel": jnp.zeros((3, 3, 2, 4))},
                             "norm": {"scale": jnp.zeros((4,))}}}
        lrs = init_lr_tree(params, hierarchy_level="neuron", init_lr=1e-3,
                           use_log=True)
        per = lr_per_tensor(lrs, use_log=True)
        assert set(per) == {"params/conv/kernel", "params/norm/scale"}
        for v in per.values():
            np.testing.assert_allclose(v, 1e-3, rtol=1e-5)
