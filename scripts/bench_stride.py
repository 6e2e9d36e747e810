"""Settle the os16-vs-os8 question with numbers (round-2 verdict item 2).

The reference trunk is os8 (replace_stride_with_dilation=[False,True,True],
/root/reference/src/networks/deeplabv3plus.py:113-118); the flagship bench
runs os16 (standard DeepLab setting, ~2x better MXU mapping). This script
records, on the real chip:

  1. an e-OSVOS-50-OnA fps row per stride (bench.py methodology: 67-frame
     480p sequences, uint8-mask transfer barrier, median of 3 sequences);
  2. held-out one-shot J per stride from the SAME meta-trained checkpoint
     (scripts/exp_meta_480p_tpu.py output) — ResNet dilation changes touch
     no parameter shapes, so one checkpoint evaluates at both strides —
     plus the random-init J per stride under the identical protocol.

Writes BENCH_STRIDE.json. The disk-protocol J delta is recorded separately
by `tpu_e2e_disk_480p.py --stride {8,16}`.

Usage:  nohup python scripts/bench_stride.py \
            [--ckpt /tmp/meta480_ckpt_r3/last_meta_iter.ckpt] \
            > /tmp/stride.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

_ap = argparse.ArgumentParser()
_ap.add_argument("--ckpt", default="/tmp/meta480_ckpt_r3/last_meta_iter.ckpt")
_ap.add_argument("--out", default=None)
# --fps-only: refresh the fps rows under the current bench.py protocol but
# carry the recorded held-out J columns forward unchanged (they were
# measured from the 300-iter meta checkpoint, which may no longer be on
# disk; J does not depend on the timing protocol)
_ap.add_argument("--fps-only", action="store_true")
ARGS = _ap.parse_args()

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_OUT = ARGS.out or os.path.join(_REPO, "BENCH_STRIDE.json")

BASELINE_FPS = 0.35  # e-OSVOS-50-OnA on V100 (BASELINE.md)
H, W, T = 480, 854, 67


def main():
    from flax import serialization

    from e_osvos_tpu.data.synthetic import SyntheticVOSIndex
    from e_osvos_tpu.data.transforms import AugmentConfig
    from e_osvos_tpu.engine import OneShotConfig, OneShotEvaluator
    from e_osvos_tpu.meta_optim import MetaOptimConfig, init_meta_params
    from e_osvos_tpu.models import DeepLabV3Plus

    meta_cfg = MetaOptimConfig(lr_hierarchy_level="neuron", init_lr=1e-3,
                               learn_model_init=True, use_log_init_lr=False)

    bench_index = SyntheticVOSIndex(num_sequences=4, num_frames=T,
                                    size=(H, W), num_objects=1, seed=0)
    held = SyntheticVOSIndex(num_sequences=4, num_frames=10, size=(H, W),
                             num_objects=1, seed=100, name_prefix="held")
    key = jax.random.PRNGKey(0)

    result = {"protocols": {
        "fps": "e-OSVOS-50-OnA, 67-frame 480p, median of 3 sequences, "
               "uint8-mask transfer barrier (bench.py methodology)",
        "J": "e-OSVOS-10 held-out (exp_meta_480p_tpu.py protocol, "
             "4 sequences at 480x854)",
        "ckpt": ARGS.ckpt if os.path.exists(ARGS.ckpt) else None,
    }, "rows": []}

    raw = None
    if os.path.exists(ARGS.ckpt):
        with open(ARGS.ckpt, "rb") as f:
            raw = serialization.msgpack_restore(f.read())

    # snapshot the prior file ONCE (the per-stride write below overwrites
    # it, so late reads would lose the other stride's recorded J columns)
    prior = {}
    if ARGS.fps_only and os.path.exists(_OUT):
        with open(_OUT) as f:
            prior = json.load(f)
        result["protocols"]["J"] = prior.get("protocols", {}).get(
            "J", result["protocols"]["J"])
        result["protocols"]["ckpt"] = prior.get("protocols", {}).get(
            "ckpt", result["protocols"].get("ckpt"))

    for stride in (16, 8):
        model = DeepLabV3Plus(
            num_classes=1, arch="resnet50", backbone_norm="frozen_bn",
            output_stride=stride, dtype=jnp.bfloat16,
        )
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), jnp.float32)
        )
        meta_rand = init_meta_params(meta_cfg, params)
        meta_ckpt = None
        if raw is not None:
            meta_ckpt = serialization.from_state_dict(
                init_meta_params(meta_cfg, params), raw["meta_params"]
            )

        # ---- fps row (e-OSVOS-50-OnA) ----
        cfg_ona = OneShotConfig(
            num_epochs=50, batch_size=3, loss_func="dice",
            online_adapt_step=5, online_adapt_epochs=10,
            online_adapt_min_prop=0.75, augment=AugmentConfig(),
        )
        ev_ona = OneShotEvaluator(model.apply, meta_cfg, cfg_ona)

        from e_osvos_tpu.ops.bits import pack_mask_bits, unpack_mask_bits

        # bench.py protocol: jitted threshold+pack (eager ops cost one
        # dispatch RPC each) and frames pre-staged outside the timed region
        thresh_pack = jax.jit(
            lambda p: pack_mask_bits(p >= cfg_ona.threshold)
        )
        jit_touch = jax.jit(
            lambda x: jnp.sum(x[:, 0, 0, 0].astype(jnp.int32))
        )
        staged = {}
        for name in bench_index.sequences:
            fstack = jnp.asarray(np.stack(
                [bench_index.get_image(name, t) for t in range(T)]
            ))
            int(jit_touch(fstack))  # barrier: upload has landed
            staged[name] = fstack

        def run_seq(name):
            seq = bench_index.sequences[name]
            group = seq.object_groups[0]
            frames = staged[name]
            probs = ev_ona._eval_object_group(
                bench_index, seq, frames, group, meta_rand, key, None,
                support_img=frames[group.support_frame],
            )
            # bit-packed wire transfer + host unpack inside the timed
            # region (ops/bits.py; see bench.py for the rationale)
            return unpack_mask_bits(np.asarray(thresh_pack(probs)),
                                    probs.shape[-1])

        t_c0 = time.time()
        run_seq("seq00")  # warmup/compile
        print(f"[os{stride}] warmup {time.time()-t_c0:.0f}s", flush=True)
        times = []
        for name in ("seq01", "seq02", "seq03"):
            t0 = time.perf_counter()
            run_seq(name)
            times.append(time.perf_counter() - t0)
        fps = T / float(np.median(times))
        print(f"[os{stride}] fps={fps:.3f} (times {times})", flush=True)

        # ---- held-out J rows (e-OSVOS-10) ----
        cfg_10 = OneShotConfig(num_epochs=10, batch_size=3,
                               loss_func="cross_entropy_and_dice",
                               augment=AugmentConfig())
        ev10 = OneShotEvaluator(model.apply, meta_cfg, cfg_10)

        def eval_held(mp, tag):
            js = []
            for n in held.sequences:
                r = ev10.eval_sequence(held, n, mp, jax.random.PRNGKey(5))
                js.append(r["J_mean"])
                print(f"  [os{stride}/{tag}] {n}: J={r['J_mean']:.4f}",
                      flush=True)
            return float(np.mean(js))

        if ARGS.fps_only:
            prior_row = next(
                (pr for pr in prior.get("rows", [])
                 if pr.get("output_stride") == stride), {})
            j_rand = prior_row.get("J_heldout_random_init")
            j_meta = prior_row.get("J_heldout_meta")
        else:
            j_rand = eval_held(meta_rand, "rand")
            j_meta = (eval_held(meta_ckpt, "meta")
                      if meta_ckpt is not None else None)

        result["rows"].append({
            "output_stride": stride,
            "fps_e-OSVOS-50-OnA": round(fps, 3),
            "vs_baseline": round(fps / BASELINE_FPS, 2),
            "seq_times_s": [round(t, 2) for t in times],
            "J_heldout_random_init": round(j_rand, 4)
            if j_rand is not None else None,
            "J_heldout_meta": round(j_meta, 4) if j_meta is not None else None,
        })
        with open(_OUT, "w") as f:
            json.dump(result, f, indent=1)
        print(json.dumps(result["rows"][-1]), flush=True)

    print(f"wrote {_OUT}", flush=True)


if __name__ == "__main__":
    main()
