"""Roofline: how close the flagship compute path runs to the chip's peak.

Two hot programs are measured (the ones every e-OSVOS-T configuration is
built from, SURVEY.md §3.2-3.3):

  * inference forward  — segment_frames per frame at 480p
  * fine-tune step     — forward+backward of the support loss at batch 3
                         (the reference's batch_sizes.train)

FLOPs come from XLA's own cost model (``compiled.cost_analysis()``), so
the count is for the program ACTUALLY executed (post-fusion, incl. the
bilinear upsample and loss), not a hand count. Timing chains N executions
inside one jitted ``lax.fori_loop`` with a scalar accumulator — per-call
output transfer over the tunnel would otherwise swamp compute
(PERF.md "What the microbenchmarks established") — and the single scalar
fetch is the barrier. Peak used: v5e bf16 ≈ 197 TFLOP/s.

Writes BENCH_ROOFLINE.json and prints one JSON line per row.
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

H, W = 480, 864  # the padded eval geometry (854 → 864, multiple of 32)
PEAK_TFLOPS = 197.0  # v5e bf16
N_CHAIN = 10


def flops_of(fn, *args) -> float:
    cost = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost["flops"])


def time_chained(fn, *args) -> float:
    """Median wall-clock of one fn execution, chained N_CHAIN times in one
    program with a scalar accumulator; scalar fetch is the barrier."""

    def many(*a):
        def body(i, acc):
            return acc + fn(*a, salt=i)
        return jax.lax.fori_loop(0, N_CHAIN, body, jnp.float32(0))

    jit_many = jax.jit(many)
    float(jit_many(*args))  # warm/compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jit_many(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / N_CHAIN


def main():
    from e_osvos_tpu.data.transforms import AugmentConfig
    from e_osvos_tpu.engine.one_shot import (
        OneShotConfig,
        make_support_loss_fn,
        segment_frames,
    )
    from e_osvos_tpu.models import DeepLabV3Plus

    rows = []
    for stride in (16, 8):
        model = DeepLabV3Plus(
            num_classes=1, arch="resnet50", backbone_norm="frozen_bn",
            output_stride=stride, dtype=jnp.bfloat16,
        )
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), jnp.float32)
        )
        cfg = OneShotConfig(batch_size=3, loss_func="dice",
                            augment=AugmentConfig())

        # -- inference forward, batch 1 (the propagation hot op) --
        frame = jnp.zeros((1, H, W, 3), jnp.float32)

        def infer(params, frame, salt=0):
            out = segment_frames(
                model.apply, cfg, params, frame + salt * 1e-6
            )
            return out.astype(jnp.float32).sum()

        f_inf = flops_of(lambda p, x: infer(p, x), params, frame)
        t_inf = time_chained(infer, params, frame)

        # -- fine-tune step: value+grad of the support loss at batch 3 --
        loss_fn = make_support_loss_fn(model.apply, cfg)
        img = jnp.zeros((H, W, 3), jnp.float32)
        label = jnp.zeros((H, W), jnp.int32)
        key = jax.random.PRNGKey(1)

        def ft_step(params, key, img, label, salt=0):
            k = jax.random.fold_in(key, salt)
            loss, grads = jax.value_and_grad(loss_fn)(
                params, (k, img, label)
            )
            acc = sum(
                g.astype(jnp.float32).sum()
                for g in jax.tree_util.tree_leaves(grads)
            )
            return loss.astype(jnp.float32) + 0.0 * acc

        f_ft = flops_of(
            lambda p, k, i, l: ft_step(p, k, i, l), params, key, img, label
        )
        t_ft = time_chained(ft_step, params, key, img, label)

        for name, f, t in (("infer_b1", f_inf, t_inf),
                           ("finetune_fwdbwd_b3", f_ft, t_ft)):
            row = {
                "program": name,
                "output_stride": stride,
                "gflops": round(f / 1e9, 1),
                "ms": round(t * 1e3, 2),
                "tflops_per_s": round(f / t / 1e12, 1),
                "pct_of_v5e_bf16_peak": round(100 * f / t / 1e12 / PEAK_TFLOPS, 1),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_ROOFLINE.json"), "w") as fh:
        json.dump({"peak_tflops_bf16": PEAK_TFLOPS, "hw": "v5e (1 chip)",
                   "geometry": [H, W], "rows": rows}, fh, indent=1)


if __name__ == "__main__":
    main()
