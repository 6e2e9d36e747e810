"""Serving-mode throughput: pipelined eval_stream vs serial, ALL-IN.

The latency headline (bench.py) pre-stages frames because the reference's
timed region consumes a prefetching DataLoader. This row is the complement:
aggregate throughput over a batch of sequences with EVERYTHING inside the
timer — host frame assembly, upload, fine-tune, segmentation, bit-packed
mask fetch, host unpack — at the e-OSVOS-50 configuration (50-step
fine-tune, no OnA; reference anchor 1.64 fps on V100, BASELINE.md /
src/visualization.ipynb cell 3).

eval_stream (engine/one_shot.py) dispatches every sequence's fused
fine-tune→segment→pack program before fetching any result, so sequence
k+1's upload rides the wire while sequence k computes. The serial variant
drains each sequence before starting the next — the difference is the
pipelining win under real I/O.

Writes BENCH_STREAM.json. Run:
  nohup python scripts/bench_stream.py > /tmp/bench_stream.log 2>&1 &
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

BASELINE_FPS = 1.64  # e-OSVOS-50 (no OnA) on V100
H, W, T = 480, 854, 67
K = 4  # timed sequences per mode


def main():
    from e_osvos_tpu.data.synthetic import SyntheticVOSIndex
    from e_osvos_tpu.data.transforms import AugmentConfig
    from e_osvos_tpu.engine import OneShotConfig, OneShotEvaluator
    from e_osvos_tpu.meta_optim import MetaOptimConfig, init_meta_params
    from e_osvos_tpu.models import DeepLabV3Plus

    model = DeepLabV3Plus(
        num_classes=1, arch="resnet50", backbone_norm="frozen_bn",
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
    cfg = OneShotConfig(
        num_epochs=50, batch_size=3, loss_func="dice",
        augment=AugmentConfig(),
    )
    ev = OneShotEvaluator(model.apply, meta_cfg, cfg)
    index = SyntheticVOSIndex(
        num_sequences=2 * K + 1, num_frames=T, size=(H, W),
        num_objects=1, seed=0,
    )
    key = jax.random.PRNGKey(0)
    names = sorted(index.sequences)

    # warmup: compiles the fused one_shot_packed program
    ev.eval_stream(index, names[:1], meta_params, key)

    # serial: drain each sequence before dispatching the next (upload,
    # compute, and fetch phases serialize)
    t0 = time.perf_counter()
    for n in names[1:1 + K]:
        ev.eval_stream(index, [n], meta_params, key)
    serial_s = time.perf_counter() - t0

    # pipelined: all K sequences dispatched before any fetch
    t0 = time.perf_counter()
    ev.eval_stream(index, names[1 + K:1 + 2 * K], meta_params, key)
    stream_s = time.perf_counter() - t0

    row = {
        "metric": "throughput_480p_e-OSVOS-50_serving_all_in",
        "value": round(K * T / stream_s, 4),
        "unit": "frames/sec aggregate (incl. upload + fetch + host unpack)",
        "vs_baseline": round(K * T / stream_s / BASELINE_FPS, 3),
        "serial_fps": round(K * T / serial_s, 4),
        "pipeline_speedup": round(serial_s / stream_s, 3),
        "sequences": K,
        "frames_per_seq": T,
    }
    print(json.dumps(row), flush=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_STREAM.json"), "w") as f:
        json.dump(row, f, indent=1)


if __name__ == "__main__":
    main()
