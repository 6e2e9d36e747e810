"""Fused-OnA vs host-window-loop A/B at the 480p headline config.

Two formulations of the SAME e-OSVOS-50-OnA computation (50 fine-tune
steps, OnA every 5 frames x 10 epochs, 67-frame 480p sequence):

  host  — the host window loop: one jitted program per phase (window
          inference, OnA refit), ~12 dispatches per window;
  fused — propagate_windows_fused: the whole propagation as one
          lax.scan program (one dispatch per sequence).

Frames are pre-uploaded (device-resident) and the only fetch is the
bit-packed mask, so the A/B isolates DEVICE execution of the two
program shapes from tunnel-transfer variance (which swamped the first
attempt at this comparison: 5.1-6.1 fps host vs 3.7-3.9 fused across
runs hours apart). Median of 3 sequences each. Writes BENCH_FUSED_AB.json.

Run on real TPU:  nohup python scripts/bench_fused_ab.py > /tmp/ab.log &
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

H, W, T = 480, 854, 67
BASELINE_FPS = 0.35


def main():
    from e_osvos_tpu.data.synthetic import SyntheticVOSIndex
    from e_osvos_tpu.data.transforms import AugmentConfig
    from e_osvos_tpu.engine import OneShotConfig, OneShotEvaluator
    from e_osvos_tpu.meta_optim import MetaOptimConfig, init_meta_params
    from e_osvos_tpu.models import DeepLabV3Plus
    from e_osvos_tpu.ops.bits import pack_mask_bits, unpack_mask_bits

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
        online_adapt_step=5, online_adapt_epochs=10,
        online_adapt_min_prop=0.75, augment=AugmentConfig(),
    )
    index = SyntheticVOSIndex(num_sequences=4, num_frames=T, size=(H, W),
                              num_objects=1, seed=0)
    key = jax.random.PRNGKey(0)
    thresh_pack = jax.jit(lambda p: pack_mask_bits(p >= cfg.threshold))
    jit_touch = jax.jit(lambda x: jnp.sum(x[:, 0, 0, 0].astype(jnp.int32)))

    # pre-stage every sequence on device (outside every timed region)
    staged = {}
    for name in index.sequences:
        frames = jnp.asarray(np.stack(
            [index.get_image(name, t) for t in range(T)]
        ))
        int(jit_touch(frames))
        staged[name] = frames

    out = {}
    for mode, fused in (("host", False), ("fused", True)):
        ev = OneShotEvaluator(model.apply, meta_cfg, cfg, fused_ona=fused)

        def run_seq(name):
            seq = index.sequences[name]
            frames = staged[name]
            probs = ev._eval_object_group(
                index, seq, frames, seq.object_groups[0], meta_params,
                key, None, support_img=frames[0],
            )
            return unpack_mask_bits(np.asarray(thresh_pack(probs)), W)

        run_seq("seq00")  # warm/compile
        times = []
        for name in ("seq01", "seq02", "seq03"):
            t0 = time.perf_counter()
            run_seq(name)
            times.append(time.perf_counter() - t0)
        fps = T / float(np.median(times))
        out[mode] = {
            "s_per_seq": [round(t, 3) for t in times],
            "fps": round(fps, 3),
            "vs_baseline": round(fps / BASELINE_FPS, 2),
        }
        print(json.dumps({mode: out[mode]}), flush=True)

    out["protocol"] = (
        "e-OSVOS-50-OnA, 67-frame 480p, device-resident frames, "
        "bit-packed mask fetch as barrier, median of 3 sequences"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_FUSED_AB.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
