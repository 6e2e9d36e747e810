"""e-OSVOS-100-OnA benchmark row — the reference's highest-J configuration.

Same methodology as bench.py (timed region = fine-tune + OnA + inference per
sequence, uint8 mask transfer as the barrier, 67-frame 480p sequences), with
the 100-step initial fine-tune (README.md:88-93 row 4; reference anchor
0.29 fps, src/visualization.ipynb cell 3).

Prints ONE json line like bench.py.
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

BASELINE_FPS = 0.29  # e-OSVOS-100-OnA on V100 (BASELINE.md)


def main():
    from e_osvos_tpu.data.synthetic import SyntheticVOSIndex
    from e_osvos_tpu.data.transforms import AugmentConfig
    from e_osvos_tpu.engine import OneShotConfig, OneShotEvaluator
    from e_osvos_tpu.meta_optim import MetaOptimConfig, init_meta_params
    from e_osvos_tpu.models import DeepLabV3Plus

    H, W, T = 480, 854, 67

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

    # e-OSVOS-100-OnA: 100 init epochs, OnA every 5 frames x 10 epochs
    cfg = OneShotConfig(
        num_epochs=100,
        batch_size=3,
        loss_func="dice",
        online_adapt_step=5,
        online_adapt_epochs=10,
        online_adapt_min_prop=0.75,
        augment=AugmentConfig(),
    )
    evaluator = OneShotEvaluator(model.apply, meta_cfg, cfg)
    index = SyntheticVOSIndex(
        num_sequences=4, num_frames=T, size=(H, W), num_objects=1, seed=0
    )
    key = jax.random.PRNGKey(0)

    from e_osvos_tpu.ops.bits import pack_mask_bits, unpack_mask_bits

    # threshold + bit-pack as ONE jitted program (eager ops each cost a
    # dispatch round-trip over the tunnel — see bench.py)
    thresh_pack = jax.jit(
        lambda p: pack_mask_bits(p >= evaluator.cfg.threshold)
    )

    # frames pre-staged on device OUTSIDE the timed region (bench.py
    # protocol: the reference times a prefetching-DataLoader consumer, not
    # this environment's WAN-tunnel upload)
    jit_touch = jax.jit(lambda x: jnp.sum(x[:, 0, 0, 0].astype(jnp.int32)))
    staged = {}
    for name in index.sequences:
        f = jnp.asarray(
            np.stack([index.get_image(name, t) for t in range(T)])
        )
        int(jit_touch(f))  # barrier: upload has landed
        staged[name] = f

    def run_seq(name):
        seq = index.sequences[name]
        group = seq.object_groups[0]
        frames = staged[name]
        probs = evaluator._eval_object_group(
            index, seq, frames, group, meta_params, key, None,
            support_img=frames[group.support_frame],
        )
        # bit-packed wire transfer + host unpack inside the timed region
        # (ops/bits.py; see bench.py for the rationale)
        return unpack_mask_bits(np.asarray(thresh_pack(probs)),
                                probs.shape[-1])

    run_seq("seq00")  # warmup / compile
    # median over 3 distinct sequences (robust to tunnel-transfer variance,
    # same sampling as bench.py)
    times = []
    for name in ("seq01", "seq02", "seq03"):
        t0 = time.perf_counter()
        run_seq(name)
        times.append(time.perf_counter() - t0)

    fps = T / float(np.median(times))
    row = {
        "metric": "fps_480p_e-OSVOS-100-OnA_incl_finetune",
        "value": round(fps, 4),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "seq_times_s": [round(t, 2) for t in times],
    }
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_100ONA.json"), "w") as f:
        json.dump(row, f)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
