"""e-OSVOS-T runtime curve: s/frame vs fine-tune steps T on one TPU chip.

Reproduces the reference's paper-figure sweep (BASELINE.md rows 9-10:
s/frame = 0.14 / 0.164 / 0.18 / 0.234 / 0.397 / 0.69 / 2.96 at
T = 1 / 5 / 10 / 20 / 50 / 100 / 500 on V100). No online adaptation,
matching the reference sweep configuration. Timed as a 4-sequence
steady-state stream (OneShotEvaluator.eval_stream): uploads overlap
compute, one fused dispatch + one bit-packed fetch per sequence — the
reference's DataLoader workers overlap its host IO identically, so both
sides are measured at their deployment steady state. Median of 3 runs.
Writes jsonl rows + prints a table; rows merge into BENCH_SWEEP.json.

Run on real TPU:  python scripts/bench_sweep.py [--only 500 ...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

REFERENCE_S_PER_FRAME = {1: 0.14, 5: 0.164, 10: 0.18, 20: 0.234, 50: 0.397,
                         100: 0.69, 500: 2.96}

_ap = argparse.ArgumentParser()
_ap.add_argument("--only", type=int, nargs="*", default=None,
                 help="run only these T values (others keep existing rows)")
ARGS = _ap.parse_args()


def main():
    from e_osvos_tpu.data.synthetic import SyntheticVOSIndex
    from e_osvos_tpu.data.transforms import AugmentConfig
    from e_osvos_tpu.engine import OneShotConfig, OneShotEvaluator
    from e_osvos_tpu.meta_optim import MetaOptimConfig, init_meta_params
    from e_osvos_tpu.models import DeepLabV3Plus

    # 67 frames = DAVIS-2017 val average sequence length (amortization parity)
    H, W, T_FRAMES = 480, 854, 67
    model = DeepLabV3Plus(
        num_classes=1, arch="resnet50", backbone_norm="frozen_bn",
        output_stride=16, dtype=jnp.bfloat16,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), jnp.float32)
    )
    meta_cfg = MetaOptimConfig(init_lr=1e-3, use_log_init_lr=False)
    meta_params = init_meta_params(meta_cfg, params)
    # steady-state protocol: a STREAM of sequences through eval_stream —
    # one fused (fine-tune -> segment -> threshold -> bit-pack) dispatch
    # per sequence, sequence k+1's frame upload overlapping sequence k's
    # compute, packed masks drained at the end. This is the deployment
    # shape; the reference's DataLoader worker pool overlaps its host
    # loading the same way, so neither side pays wire/IO serially.
    N_STREAM = 4
    index = SyntheticVOSIndex(num_sequences=N_STREAM + 1,
                              num_frames=T_FRAMES, size=(H, W), seed=0)
    stream_names = [f"seq{i:02d}" for i in range(1, N_STREAM + 1)]
    key = jax.random.PRNGKey(0)

    rows = []
    todo = ARGS.only if ARGS.only else (1, 5, 10, 20, 50, 100, 500)
    for T in todo:
        cfg = OneShotConfig(num_epochs=T, batch_size=3, loss_func="dice",
                            augment=AugmentConfig())
        ev = OneShotEvaluator(model.apply, meta_cfg, cfg)

        ev.eval_stream(index, ["seq00"], meta_params, key)  # warm/compile
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            ev.eval_stream(index, stream_names, meta_params, key)
            times.append(time.perf_counter() - t0)
        spf = float(np.median(times)) / (N_STREAM * T_FRAMES)
        ref = REFERENCE_S_PER_FRAME[T]
        row = {"T": T, "s_per_frame": round(spf, 4),
               "fps": round(1 / spf, 3),
               "ref_s_per_frame": ref,
               "speedup_vs_ref": round(ref / spf, 2)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    # merge with any existing rows (so --only runs update in place)
    merged = {}
    if os.path.exists("BENCH_SWEEP.json"):
        for r in json.load(open("BENCH_SWEEP.json")):
            merged[r["T"]] = r
    for r in rows:
        merged[r["T"]] = r
    with open("BENCH_SWEEP.json", "w") as f:
        json.dump([merged[t] for t in sorted(merged)], f, indent=1)


if __name__ == "__main__":
    main()
