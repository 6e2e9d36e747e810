"""Breakdown of one DENSE (DeepLabV3+) fine-tune step at 480p — the
headline's dominant cost (50 init steps + 120 OnA refit steps/sequence).

Stages (scan-chained, scalar outputs — tunnel-safe, CLAUDE.md rules):
  warp       augment_support_batch(B=3) + normalize only
  fwd        dice loss forward on FIXED pre-augmented imgs (no warp)
  grad       value_and_grad on fixed imgs (fwd+bwd, no warp/update)
  step       the real fine_tune scan body: warp + grad + lr update +
             early-stop select machinery (patience as configured)
  step_nosel same but early_stop_patience=0 AND the select elided
             (plain inner_sgd_step) — prices the per-step full-tree select
  step_norem step with remat=False — prices jax.checkpoint on the
             never-differentiated eval path
  refit      OnA refit step: pseudo-GT loss (1 support + 3 pseudo, no
             augmentation) fwd+bwd+update — the program that runs 120x
             per headline sequence
  infer5     5-frame window inference (segment_frames)

Anchors: BENCH_ROOFLINE.json finetune_fwdbwd_b3 os16 = 44.5 ms;
PERF.md ledger fine-tune loop ~3.5 s at os16 → ~70 ms/step all-in.

Run: nohup python scripts/bench_dense_ft_parts.py > /tmp/dense_ft.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from e_osvos_tpu.data import transforms  # noqa: E402
from e_osvos_tpu.engine.one_shot import (  # noqa: E402
    OneShotConfig,
    make_pseudo_gt_loss_fn,
    make_support_loss_fn,
)
from e_osvos_tpu.meta_optim.meta_optimizer import (  # noqa: E402
    MetaOptimConfig,
    fine_tune,
    init_meta_params,
    inner_sgd_step,
    materialize_lrs,
)
from e_osvos_tpu.models import DeepLabV3Plus  # noqa: E402

# env overrides let a tiny-shape CPU smoke run validate the harness
H = int(os.environ.get("FT_H", 480))
W = int(os.environ.get("FT_W", 854))
ARCH = os.environ.get("FT_ARCH", "resnet50")
B = 3
ITERS = int(os.environ.get("FT_ITERS", 5))
REPS = 3


def timed(fn, *args):
    """Best-of-REPS wall time; np.asarray is the transfer barrier (the axon
    tunnel's block_until_ready does not block — CLAUDE.md)."""
    np.asarray(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print(f"devices: {jax.devices()}", flush=True)
    model = DeepLabV3Plus(
        num_classes=1, arch=ARCH, backbone_norm="frozen_bn",
        output_stride=16, dtype=jnp.bfloat16,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), jnp.float32)
    )
    meta_cfg = MetaOptimConfig(
        lr_hierarchy_level="neuron", init_lr=1e-3,
        learn_model_init=True, use_log_init_lr=False,
    )
    meta_params = init_meta_params(meta_cfg, params)
    cfg = OneShotConfig(num_epochs=50, batch_size=B, loss_func="dice")

    rs = np.random.RandomState(0)
    frame = jnp.asarray(rs.rand(H, W, 3) * 255, jnp.float32)
    label = jnp.zeros((H, W), jnp.int32).at[100:300, 200:500].set(1)

    support_loss = make_support_loss_fn(model.apply, cfg)
    lrs = materialize_lrs(meta_params.log_init_lr, meta_cfg.use_log_init_lr)

    # fixed pre-augmented batch for the isolated fwd/grad stages
    fixed_imgs, fixed_labels = transforms.augment_support_batch(
        jax.random.PRNGKey(7), frame, label, B, cfg.augment
    )
    fixed_imgs = transforms.normalize(fixed_imgs, cfg.normalize_mode)
    fixed_valid = fixed_labels != 255
    fixed_gts = jnp.where(fixed_valid, fixed_labels, 0).astype(jnp.float32)

    from e_osvos_tpu.ops import losses as loss_ops

    def fixed_loss(p, imgs):
        logits = model.apply(p, imgs)[..., 0]
        return loss_ops.compute_loss(cfg.loss_func, logits, fixed_gts,
                                     fixed_valid)

    results = {}

    def record(name, per_step_ms):
        results[name] = round(per_step_ms, 2)
        print(f"{name:11s} {per_step_ms:8.2f} ms/step", flush=True)

    # --- warp only ---
    def run_warp(key):
        def step(k, _):
            k, ks = jax.random.split(k)
            imgs, labels = transforms.augment_support_batch(
                ks, frame, label, B, cfg.augment
            )
            imgs = transforms.normalize(imgs, cfg.normalize_mode)
            return k, jnp.sum(imgs) + jnp.sum(labels)
        _, outs = jax.lax.scan(step, key, None, length=ITERS)
        return jnp.sum(outs)

    record("warp", timed(jax.jit(run_warp), jax.random.PRNGKey(3))
           * 1e3 / ITERS)

    # --- forward only (fixed batch; the carry perturbs the INPUT by a
    # non-foldable epsilon so XLA can't hoist the body as loop-invariant) ---
    def run_fwd(seed):
        def step(c, _):
            l = fixed_loss(params, fixed_imgs + c * 1e-6)
            return c + 1, l
        _, outs = jax.lax.scan(step, seed, None, length=ITERS)
        return jnp.sum(outs)

    record("fwd", timed(jax.jit(run_fwd), jnp.asarray(0.0)) * 1e3 / ITERS)

    # --- fwd+bwd only ---
    def run_grad(seed):
        def step(c, _):
            l, g = jax.value_and_grad(fixed_loss)(
                params, fixed_imgs + c * 1e-6)
            gs = sum(jnp.max(jnp.abs(x)).astype(jnp.float32)
                     for x in jax.tree_util.tree_leaves(g))
            return c + 1, l + gs
        _, outs = jax.lax.scan(step, seed, None, length=ITERS)
        return jnp.sum(outs)

    record("grad", timed(jax.jit(run_grad), jnp.asarray(0.0)) * 1e3 / ITERS)

    # --- real fine_tune scan body variants (carry params, ITERS steps) ---
    def ft_variant(patience, remat):
        def run(key):
            keys = jax.random.split(key, ITERS)
            batches = (
                keys,
                jnp.broadcast_to(frame, (ITERS,) + frame.shape),
                jnp.broadcast_to(label, (ITERS,) + label.shape),
            )
            p, losses = fine_tune(
                meta_cfg, support_loss, meta_params, batches,
                early_stop_patience=patience, remat=remat,
            )
            return jnp.sum(losses) + sum(
                jnp.max(jnp.abs(x)).astype(jnp.float32)
                for x in jax.tree_util.tree_leaves(p))
        return jax.jit(run)

    record("step", timed(ft_variant(0, True), jax.random.PRNGKey(3))
           * 1e3 / ITERS)
    record("step_norem", timed(ft_variant(0, False), jax.random.PRNGKey(3))
           * 1e3 / ITERS)

    # --- plain inner_sgd_step scan (no early-stop select machinery) ---
    def run_nosel(key):
        keys = jax.random.split(key, ITERS)
        batches = (
            keys,
            jnp.broadcast_to(frame, (ITERS,) + frame.shape),
            jnp.broadcast_to(label, (ITERS,) + label.shape),
        )

        def step(p, batch):
            newp, l = inner_sgd_step(meta_cfg, support_loss, p, lrs, batch)
            return newp, l
        p, losses = jax.lax.scan(step, meta_params.model_init, batches)
        return jnp.sum(losses) + sum(
            jnp.max(jnp.abs(x)).astype(jnp.float32)
            for x in jax.tree_util.tree_leaves(p))

    record("step_nosel", timed(jax.jit(run_nosel), jax.random.PRNGKey(3))
           * 1e3 / ITERS)

    # --- OnA refit step (1 support + 3 pseudo, no warp) ---
    pseudo_loss = make_pseudo_gt_loss_fn(model.apply, cfg)
    prop_imgs = jnp.asarray(rs.rand(3, H, W, 3) * 255, jnp.float32)
    prop_labels = jnp.zeros((3, H, W), jnp.int32).at[:, 120:280, 220:480].set(1)

    def run_refit(seed):
        batch = (frame, label, prop_imgs, prop_labels)

        def step(p, _):
            newp, l = inner_sgd_step(meta_cfg, pseudo_loss, p, lrs, batch)
            return newp, l
        p, losses = jax.lax.scan(step, meta_params.model_init, None,
                                 length=ITERS)
        return jnp.sum(losses) + sum(
            jnp.max(jnp.abs(x)).astype(jnp.float32)
            for x in jax.tree_util.tree_leaves(p))

    record("refit", timed(jax.jit(run_refit), jnp.asarray(0.0))
           * 1e3 / ITERS)

    # --- 5-frame window inference ---
    frames5 = jnp.asarray(rs.rand(5, H, W, 3) * 255, jnp.float32)

    def run_infer(seed):
        def step(c, _):
            imgs = transforms.normalize(frames5 + c * 1e-6,
                                        cfg.normalize_mode)
            logits = model.apply(params, imgs)[..., 0]
            return c + 1, jnp.sum(jax.nn.sigmoid(logits))
        _, outs = jax.lax.scan(step, seed, None, length=ITERS)
        return jnp.sum(outs)

    record("infer5", timed(jax.jit(run_infer), jnp.asarray(0.0))
           * 1e3 / ITERS)

    print(json.dumps({"bench": "dense_ft_parts", "H": H, "W": W, "B": B,
                      "output_stride": 16, "ms_per_step": results}),
          flush=True)


if __name__ == "__main__":
    main()
