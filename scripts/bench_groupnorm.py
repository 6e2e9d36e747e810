"""TPU microbench: flax GroupNorm vs lane-friendly GN vs frozen scale+bias.

Measures the in-situ cost of the norm inside a conv→norm→relu chain at the
Mask R-CNN GN-32 backbone's 480p shapes, forward and forward+backward.
Chained via lax.scan with a scalar-materializing barrier (np.asarray) per
CLAUDE.md: block_until_ready does not block under the axon tunnel.

Run: nohup python scripts/bench_groupnorm.py > /tmp/bench_gn.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from e_osvos_tpu.ops.group_norm import group_norm
from e_osvos_tpu.ops.pallas_group_norm import pallas_group_norm

STEPS = 10  # chained layers per timed call
REPS = 5


def flax_gn(x, scale, bias, groups):
    return nn.GroupNorm(num_groups=groups, dtype=x.dtype).apply(
        {"params": {"scale": scale, "bias": bias}}, x
    )


def fast_gn(x, scale, bias, groups):
    return group_norm(x, scale, bias, groups, relu=False)


def frozen(x, scale, bias, groups):
    return x * scale.astype(x.dtype) + bias.astype(x.dtype)


def pallas_gn(x, scale, bias, groups):
    return pallas_group_norm(x, scale, bias, groups)


def make_chain(norm_fn, w, scale, bias, groups, grad=False):
    def layer(c):
        y = jax.lax.conv_general_dilated(
            c, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = norm_fn(y, scale, bias, groups)
        return jnp.maximum(y, 0.0) + 0.01 * c  # keep magnitudes sane

    def fwd(x):
        return jax.lax.scan(lambda c, _: (layer(c), None), x, None,
                            length=STEPS)[0]

    if not grad:
        return jax.jit(lambda x: jnp.sum(fwd(x)))
    # scalar output: transferring the full gradient over the TPU tunnel
    # swamps compute (~100 ms for 40 MB)
    g = jax.grad(lambda x: jnp.sum(fwd(x)))
    return jax.jit(lambda x: jnp.sum(jnp.square(g(x))))


def timed(fn, x):
    out = fn(x)  # warm up / compile
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(x)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print(f"devices: {jax.devices()}", flush=True)
    shapes = [
        (3, 120, 216, 256),   # ~C2 at 480p, batch 3 (fine-tune batch)
        (3, 60, 108, 512),    # C3
        (3, 30, 54, 1024),    # C4
        # crossover probes (VERDICT r1 #9): small-spatial / decoder-ish
        # shapes around the _PALLAS_MIN_TOTAL_ROWS dispatch threshold
        (3, 15, 27, 2048),    # C5: 1215 rows
        (1, 120, 216, 256),   # single-frame eval C2: 25920 rows
        (3, 30, 54, 256),     # decoder trunk: 4860 rows
        (3, 60, 108, 256),    # 19440 rows — just above threshold
    ]
    key = jax.random.PRNGKey(0)
    for shape in shapes:
        c = shape[-1]
        x = jax.random.normal(key, shape, jnp.bfloat16)
        w = (
            jax.random.normal(key, (3, 3, c, c)) * float(1.0 / np.sqrt(9 * c))
        ).astype(jnp.bfloat16)
        scale = jnp.ones((c,), jnp.float32)
        bias = jnp.zeros((c,), jnp.float32)
        print(f"--- shape {shape} ---", flush=True)
        for grad in (False, True):
            tag = "fwd+bwd" if grad else "fwd"
            for name, fn in [("flax_gn", flax_gn), ("fast_gn", fast_gn),
                             ("pallas_gn", pallas_gn), ("frozen", frozen)]:
                f = make_chain(fn, w, scale, bias, 32, grad=grad)
                t = timed(f, x)
                print(
                    f"{tag:8s} {name:8s} {t * 1e3 / STEPS:8.2f} ms/layer",
                    flush=True,
                )


if __name__ == "__main__":
    main()
