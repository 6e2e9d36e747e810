"""Serving-mode throughput: pipelined eval_stream vs serial, ALL-IN.

The latency headline (bench.py) pre-stages frames because the reference's
timed region consumes a prefetching DataLoader. This row is the complement:
aggregate throughput over a batch of sequences with EVERYTHING inside the
timer — host frame assembly, upload, fine-tune, segmentation, bit-packed
mask fetch, host unpack — at TWO configurations:

* e-OSVOS-50 (50-step fine-tune, no OnA; reference anchor 1.64 fps on
  V100, BASELINE.md / src/visualization.ipynb cell 3);
* e-OSVOS-50-OnA (the flagship headline: OnA every 5 frames × 10 epochs;
  reference anchor 0.35 fps) — the round-3 verdict's missing artifact.

eval_stream (engine/one_shot.py) dispatches every sequence's fused
fine-tune[→OnA windows]→segment→pack program before fetching any result,
so sequence k+1's upload rides the wire while sequence k computes. The
serial variant drains each sequence before starting the next — the
difference is the pipelining win under real I/O.

Stream-mode numbers are WIRE-BOUND on this host: each 480p sequence
uploads T×H×W×3 ≈ 82 MB through the axon WAN tunnel, so rows scale with
measured bandwidth, not chip time. Every row therefore records
``tunnel_MBps`` (measured with a dedicated put right before the timed
section) so non-monotonic-looking numbers are self-explaining.

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
BASELINE_FPS_ONA = 0.35  # e-OSVOS-50-OnA on V100 (the headline anchor)
H, W, T = 480, 854, 67
K = 4  # timed sequences per mode


def measure_tunnel_mbps(n_bytes: int = 32 * 1024 * 1024) -> float:
    """Host→device bandwidth through the axon tunnel, measured with one
    dedicated put + device round-trip barrier (block_until_ready does not
    block over the tunnel — CLAUDE.md — so force a tiny fetch)."""
    buf = np.zeros((n_bytes,), np.uint8)
    t0 = time.perf_counter()
    dev = jnp.asarray(buf)
    np.asarray(dev[:8])  # barrier: forces the transfer to complete
    return n_bytes / (time.perf_counter() - t0) / 1e6


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
    index = SyntheticVOSIndex(
        num_sequences=2 * K + 1, num_frames=T, size=(H, W),
        num_objects=1, seed=0,
    )
    key = jax.random.PRNGKey(0)
    names = sorted(index.sequences)

    def run_mode(tag: str, cfg: OneShotConfig, anchor: float) -> dict:
        ev = OneShotEvaluator(model.apply, meta_cfg, cfg)
        # warmup: compiles the fused one_shot_packed program
        ev.eval_stream(index, names[:1], meta_params, key)
        mbps = measure_tunnel_mbps()

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
            "metric": f"throughput_480p_{tag}_serving_all_in",
            "value": round(K * T / stream_s, 4),
            "unit": "frames/sec aggregate (incl. upload + fetch + "
                    "host unpack)",
            "vs_baseline": round(K * T / stream_s / anchor, 3),
            "serial_fps": round(K * T / serial_s, 4),
            "pipeline_speedup": round(serial_s / stream_s, 3),
            "sequences": K,
            "frames_per_seq": T,
            "tunnel_MBps": round(mbps, 1),
            "upload_MB_per_seq": round(T * H * W * 3 / 1e6, 1),
        }
        print(json.dumps(row), flush=True)
        return row

    rows = {}
    rows["e-OSVOS-50"] = run_mode(
        "e-OSVOS-50",
        OneShotConfig(num_epochs=50, batch_size=3, loss_func="dice",
                      augment=AugmentConfig()),
        BASELINE_FPS,
    )
    # flagship headline configuration (bench.py protocol): OnA refits
    # every 5 frames x 10 epochs with min_prop pseudo-GT
    rows["e-OSVOS-50-OnA"] = run_mode(
        "e-OSVOS-50-OnA",
        OneShotConfig(num_epochs=50, batch_size=3, loss_func="dice",
                      augment=AugmentConfig(), online_adapt_step=5,
                      online_adapt_epochs=10, online_adapt_min_prop=0.75),
        BASELINE_FPS_ONA,
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_STREAM.json"), "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
