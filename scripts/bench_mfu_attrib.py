"""MFU attribution for the flagship fine-tune step (VERDICT r4 weak #4).

BENCH_ROOFLINE has the os16 fine-tune fwd+bwd at 21% of v5e bf16 peak vs
the repo's measured ~38% chained-conv ceiling, with no attribution. This
decomposes the 480p fine-tune step (DeepLabV3Plus / resnet50 / frozen-BN /
os16 / bf16, support batch 3 — the exact program behind the headline fps)
into separately-timed XLA programs, each with XLA's own post-fusion FLOP
count (``compiled.cost_analysis()``), so the table shows each phase's
share of the step and its own pct-of-peak:

  conv_ceiling     chained 3x3 conv stack at the trunk's dominant
                   (spatial, channels) — the achievable bound on this chip
  augment_b3       on-device support-batch warp + color jitter + normalize
  model_fwd_b3     full forward on pre-augmented inputs (backbone + ASPP +
                   decoder + full-res upsample)
  backbone_fwd_b3  trunk only (C2..C5)
  loss_b3          compute_loss alone on precomputed 480p logits
  fwdbwd_noaug_b3  value_and_grad of loss(model(x)) on FIXED inputs —
                   the step minus augmentation
  ft_step_b3       the production step (augment inside, = roofline row)

Derived: augment share, head+upsample share (model_fwd - backbone),
bwd/fwd ratio, and where the 21%->38% gap lives.

Writes BENCH_MFU_ATTRIB.json. Run on the real chip after the main queue:
  nohup python scripts/bench_mfu_attrib.py > /tmp/mfu_attrib.log 2>&1 &
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

H, W = 480, 864
B = 3
PEAK_TFLOPS = 197.0  # v5e bf16
N_CHAIN = 10
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def flops_of(fn, *args) -> float:
    cost = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost["flops"])


def time_chained(fn, *args) -> float:
    """Median wall seconds of one execution, N_CHAIN chained in one
    program; scalar fetch is the device barrier (axon tunnel rule)."""

    def many(*a):
        def body(i, acc):
            return acc + fn(*a, salt=i)
        return jax.lax.fori_loop(0, N_CHAIN, body, jnp.float32(0))

    jit_many = jax.jit(many)
    float(jit_many(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jit_many(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / N_CHAIN


def main():
    from e_osvos_tpu.data import transforms
    from e_osvos_tpu.data.transforms import AugmentConfig
    from e_osvos_tpu.engine.one_shot import OneShotConfig, make_support_loss_fn
    from e_osvos_tpu.models import DeepLabV3Plus
    from e_osvos_tpu.models.resnet import ResNet
    from e_osvos_tpu.models.deeplab import _dilate_stages
    from e_osvos_tpu.ops import losses as loss_ops

    model = DeepLabV3Plus(
        num_classes=1, arch="resnet50", backbone_norm="frozen_bn",
        output_stride=16, dtype=jnp.bfloat16,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), jnp.float32)
    )
    cfg = OneShotConfig(batch_size=B, loss_func="cross_entropy_and_dice",
                        augment=AugmentConfig())

    rows = []

    def row(name, f, t, extra=None):
        r = {"program": name, "gflops": round(f / 1e9, 1),
             "ms": round(t * 1e3, 2),
             "tflops_per_s": round(f / t / 1e12, 1),
             "pct_of_peak": round(100 * f / t / 1e12 / PEAK_TFLOPS, 1)}
        if extra:
            r.update(extra)
        rows.append(r)
        print(json.dumps(r), flush=True)
        return r

    # ---- conv ceiling: chained 3x3 at the trunk's dominant shape ----
    # os16 trunk spends most FLOPs in layer3/4: spatial (30,54), 1024ch.
    # Use a 2-layer 3x3 stack at (60,108,512) + (30,54,1024) to bracket.
    for (sh, sw, ch) in ((60, 108, 512), (30, 54, 1024)):
        k1 = jax.random.normal(jax.random.PRNGKey(1), (3, 3, ch, ch),
                               jnp.bfloat16) * 0.01
        xc = jax.random.normal(jax.random.PRNGKey(2), (B, sh, sw, ch),
                               jnp.bfloat16)

        def convchain(x, k, salt=0):
            y = x + jnp.asarray(salt, jnp.bfloat16) * 0
            for _ in range(4):
                y = jax.lax.conv_general_dilated(
                    y, k, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                y = jnp.maximum(y, 0)
            return y.astype(jnp.float32).sum()

        f = flops_of(lambda x, k: convchain(x, k, jnp.int32(0)), xc, k1)
        t = time_chained(convchain, xc, k1)
        row(f"conv_ceiling_{sh}x{sw}x{ch}", f, t)

    # ---- augment alone ----
    img = jnp.zeros((H, W, 3), jnp.float32)
    label = jnp.zeros((H, W), jnp.int32)
    key = jax.random.PRNGKey(1)

    def aug_only(key, img, label, salt=0):
        k = jax.random.fold_in(key, salt)
        imgs, labels = transforms.augment_support_batch(
            k, img, label, B, cfg.augment)
        imgs = transforms.normalize(imgs, cfg.normalize_mode)
        return imgs.astype(jnp.float32).sum() + labels.sum()

    f_aug = flops_of(lambda k, i, l: aug_only(k, i, l), key, img, label)
    t_aug = time_chained(aug_only, key, img, label)
    row("augment_b3", f_aug, t_aug)

    # ---- full forward / backbone-only forward on fixed inputs ----
    xb = jnp.zeros((B, H, W, 3), jnp.float32)

    def fwd(params, x, salt=0):
        return model.apply(params, x + salt * 1e-6).astype(
            jnp.float32).sum()

    f_fwd = flops_of(lambda p, x: fwd(p, x), params, xb)
    t_fwd = time_chained(fwd, params, xb)
    row("model_fwd_b3", f_fwd, t_fwd)

    trunk = ResNet(arch="resnet50", norm_layer="frozen_bn",
                   dilate_stages=_dilate_stages(16), dtype=jnp.bfloat16)
    tvars = {"params": params["params"]["backbone"],
             "constants": params["constants"]["backbone"]}

    def bb_fwd(tvars, x, salt=0):
        feats = trunk.apply(tvars, x + salt * 1e-6)
        return sum(f.astype(jnp.float32).sum() for f in feats.values())

    f_bb = flops_of(lambda v, x: bb_fwd(v, x), tvars, xb)
    t_bb = time_chained(bb_fwd, tvars, xb)
    row("backbone_fwd_b3", f_bb, t_bb)

    # ---- loss alone on precomputed logits ----
    logits = jnp.zeros((B, H, W), jnp.float32)
    gts = jnp.zeros((B, H, W), jnp.float32)
    valid = jnp.ones((B, H, W), bool)

    def loss_only(logits, gts, valid, salt=0):
        return loss_ops.compute_loss(
            cfg.loss_func, logits + salt * 1e-6, gts, valid)

    f_loss = flops_of(lambda a, b, c: loss_only(a, b, c), logits, gts, valid)
    t_loss = time_chained(loss_only, logits, gts, valid)
    row("loss_b3", f_loss, t_loss)

    # ---- fwd+bwd without augmentation (fixed inputs) ----
    def loss_noaug(params, x, gts, valid):
        lg = model.apply(params, x)[..., 0]
        return loss_ops.compute_loss(cfg.loss_func, lg, gts, valid)

    def fwdbwd_noaug(params, x, gts, valid, salt=0):
        l, g = jax.value_and_grad(loss_noaug)(params, x + salt * 1e-6,
                                              gts, valid)
        acc = sum(t.astype(jnp.float32).sum()
                  for t in jax.tree_util.tree_leaves(g))
        return l.astype(jnp.float32) + 0.0 * acc

    f_nb = flops_of(lambda p, x, g, v: fwdbwd_noaug(p, x, g, v),
                    params, xb, gts, valid)
    t_nb = time_chained(fwdbwd_noaug, params, xb, gts, valid)
    row("fwdbwd_noaug_b3", f_nb, t_nb)

    # ---- the production step (augment inside) ----
    loss_fn = make_support_loss_fn(model.apply, cfg)

    def ft_step(params, key, img, label, salt=0):
        k = jax.random.fold_in(key, salt)
        loss, grads = jax.value_and_grad(loss_fn)(params, (k, img, label))
        acc = sum(g.astype(jnp.float32).sum()
                  for g in jax.tree_util.tree_leaves(grads))
        return loss.astype(jnp.float32) + 0.0 * acc

    f_ft = flops_of(lambda p, k, i, l: ft_step(p, k, i, l),
                    params, key, img, label)
    t_ft = time_chained(ft_step, params, key, img, label)
    row("ft_step_b3", f_ft, t_ft)

    by = {r["program"]: r for r in rows}
    derived = {
        "augment_share_of_step": round(
            (by["ft_step_b3"]["ms"] - by["fwdbwd_noaug_b3"]["ms"])
            / by["ft_step_b3"]["ms"], 3),
        "head_ms_fwd": round(
            by["model_fwd_b3"]["ms"] - by["backbone_fwd_b3"]["ms"], 2),
        "loss_share_of_step": round(
            by["loss_b3"]["ms"] / by["ft_step_b3"]["ms"], 3),
        "bwd_over_fwd": round(
            (by["fwdbwd_noaug_b3"]["ms"] - by["model_fwd_b3"]["ms"])
            / by["model_fwd_b3"]["ms"], 2),
    }
    out = {"peak_tflops_bf16": PEAK_TFLOPS, "hw": "v5e (1 chip)",
           "geometry": [H, W], "batch": B, "rows": rows, "derived": derived}
    with open(os.path.join(REPO, "BENCH_MFU_ATTRIB.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(derived), flush=True)


if __name__ == "__main__":
    main()
