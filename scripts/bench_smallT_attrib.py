"""Small-T per-frame-overhead attribution (round-2 verdict item 4).

The e-OSVOS-T sweep's T≤20 rows sat at 2.5–3.9x the V100 reference while
every other number clears 5x. Small T is per-frame-overhead dominated, so
this script decomposes one T=1 and one T=5 sequence run (67-frame 480p,
no OnA — the sweep configuration) into:

  compute   — run with the mask reduced to ONE scalar on device (the
              transfer is 4 bytes; what remains is fine-tune + inference
              + dispatch);
  +packed   — bit-packed mask transfer + host unpack (ops/bits.py,
              3.4 MB on the wire);
  +uint8    — full uint8 mask transfer (27 MB on the wire; the round-2
              sweep methodology);
  finetune  — the fine-tune program alone (scalar barrier), isolating
              the per-sequence constant from the per-frame inference.

Writes BENCH_SMALLT.json. Run AFTER the main queue (shares the bench
compile cache).
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

H, W, T_FRAMES = 480, 854, 67


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
    meta_cfg = MetaOptimConfig(init_lr=1e-3, use_log_init_lr=False)
    meta_params = init_meta_params(meta_cfg, params)
    index = SyntheticVOSIndex(num_sequences=4, num_frames=T_FRAMES,
                              size=(H, W), seed=0)
    key = jax.random.PRNGKey(0)

    results = {}
    for T in (1, 5):
        cfg = OneShotConfig(num_epochs=T, batch_size=3, loss_func="dice",
                            augment=AugmentConfig())
        ev = OneShotEvaluator(model.apply, meta_cfg, cfg)

        def probs_for(name):
            seq = index.sequences[name]
            frames = jnp.asarray(np.stack(
                [index.get_image(name, t) for t in range(len(seq))]
            ))
            return ev._eval_object_group(
                index, seq, frames, seq.object_groups[0], meta_params, key,
                None,
            )

        def timed(fn):
            fn("seq00")  # warm
            ts = []
            for name in ("seq01", "seq02", "seq03"):
                t0 = time.perf_counter()
                fn(name)
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        # each postprocess variant is ONE jitted program — eager ops cost
        # a tunnel round-trip apiece, which would swamp what's measured
        jit_scalar = jax.jit(lambda p: (p >= 0.5).sum(dtype=jnp.int32))
        jit_pack = jax.jit(lambda p: pack_mask_bits(p >= 0.5))
        jit_uint8 = jax.jit(lambda p: (p >= 0.5).astype(jnp.uint8))

        # compute floor: scalar reduce on device, 4-byte transfer
        t_scalar = timed(lambda n: float(jit_scalar(probs_for(n))))
        # packed transfer + host unpack
        def run_packed(n):
            p = probs_for(n)
            return unpack_mask_bits(np.asarray(jit_pack(p)), p.shape[-1])
        t_packed = timed(run_packed)
        # full uint8 transfer (the round-2 methodology)
        t_uint8 = timed(lambda n: np.asarray(jit_uint8(probs_for(n))))

        # fine-tune alone (per-sequence constant)
        def ft_only(name):
            seq = index.sequences[name]
            sf = seq.object_groups[0].support_frame
            img = jnp.asarray(index.get_image(name, sf))
            from e_osvos_tpu.data.datasets import binarize_label

            lbl = jnp.asarray(
                binarize_label(index.get_label(name, sf),
                               seq.object_groups[0].object_ids), jnp.int32
            )
            p, _ = ev._jit_ft(meta_params, key, img, lbl, None)
            # scalar barrier on one updated leaf
            leaf = jax.tree_util.tree_leaves(p)[0]
            return float(jnp.sum(leaf.astype(jnp.float32)))
        t_ft = timed(ft_only)

        # raw frame-stack upload alone: host gen + [67,H,W,3] uint8
        # device_put, barrier = 4-byte on-device reduce fetch. This is
        # the wire floor every serial formulation pays per sequence.
        jit_touch = jax.jit(lambda x: jnp.sum(x[:, 0, 0, 0].astype(jnp.int32)))

        def upload_only(name):
            frames = jnp.asarray(np.stack(
                [index.get_image(name, t) for t in range(T_FRAMES)]
            ))
            return int(jit_touch(frames))
        t_up = timed(upload_only)

        # steady-state stream (eval_stream): per-sequence fused dispatch,
        # uploads overlap compute, packed masks drained at the end — the
        # sweep methodology since round 3
        ev.eval_stream(index, ["seq00"], meta_params, key)
        st = []
        for _ in range(3):
            t0 = time.perf_counter()
            ev.eval_stream(index, ["seq01", "seq02", "seq03"],
                           meta_params, key)
            st.append(time.perf_counter() - t0)
        t_stream_pf = float(np.median(st)) / (3 * T_FRAMES)

        results[f"T={T}"] = {
            "upload_only_s": round(t_up, 3),
            "stream_s_per_frame": round(t_stream_pf, 4),
            "speedup_vs_ref_stream": round(
                {1: 0.14, 5: 0.164}[T] / t_stream_pf, 2
            ),
            "scalar_s": round(t_scalar, 3),
            "packed_s": round(t_packed, 3),
            "uint8_s": round(t_uint8, 3),
            "finetune_only_s": round(t_ft, 3),
            "transfer_uint8_s": round(t_uint8 - t_scalar, 3),
            "transfer_packed_s": round(t_packed - t_scalar, 3),
            "s_per_frame_packed": round(t_packed / T_FRAMES, 4),
            "speedup_vs_ref_packed": round(
                {1: 0.14, 5: 0.164}[T] / (t_packed / T_FRAMES), 2
            ),
        }
        print(json.dumps({f"T={T}": results[f"T={T}"]}), flush=True)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_SMALLT.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
