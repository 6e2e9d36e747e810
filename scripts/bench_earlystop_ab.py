"""Eval early stopping A/B at 480p (round-3 verdict item 6).

The reference's eval fine-tune can early-stop on loss patience
(/root/reference/src/util/evaluate.py:276-280, helper_func.py:388-397) —
though its shipped config leaves it off (cfgs/meta.yaml:98 patience:
null). Our masked-latch implementation (meta_optim/meta_optimizer.py:
215-247) freezes parameters once the loss stops improving but still runs
the remaining scan iterations (static shapes: XLA cannot shorten a
compiled loop), so the latch costs ~3 HBM passes/step of tree-select
while saving nothing on a TPU unless the step itself is skipped — the
honest A/B is therefore fps overhead vs J delta, and the default should
be chosen on this evidence.

Methodology = bench.py exactly (pre-staged frames, median over 3
sequences, bit-packed mask fetch as the barrier) at the headline
e-OSVOS-50-OnA configuration; J via eval_sequence on the same sequences
(scoring outside the timer, as the reference scores after its timed
region).

Writes BENCH_EARLYSTOP.json. Run:
  nohup python scripts/bench_earlystop_ab.py > /tmp/earlystop.log 2>&1 &
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

BASELINE_FPS = 0.35
H, W, T = 480, 854, 67


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
    meta_cfg = MetaOptimConfig(lr_hierarchy_level="neuron", init_lr=1e-3,
                               learn_model_init=True, use_log_init_lr=False)
    meta_params = init_meta_params(meta_cfg, params)
    index = SyntheticVOSIndex(
        num_sequences=4, num_frames=T, size=(H, W), num_objects=1, seed=0
    )
    key = jax.random.PRNGKey(0)

    def measure(patience: int) -> dict:
        cfg = OneShotConfig(
            num_epochs=50, batch_size=3, loss_func="dice",
            online_adapt_step=5, online_adapt_epochs=10,
            online_adapt_min_prop=0.75, early_stop_patience=patience,
            augment=AugmentConfig(),
        )
        ev = OneShotEvaluator(model.apply, meta_cfg, cfg, fused_ona=True)
        thresh_pack = jax.jit(
            lambda p: pack_mask_bits(p >= ev.cfg.threshold)
        )
        jit_touch = jax.jit(
            lambda x: jnp.sum(x[:, 0, 0, 0].astype(jnp.int32))
        )
        staged = {}
        for name in index.sequences:
            f = jnp.asarray(
                np.stack([index.get_image(name, t) for t in range(T)])
            )
            int(jit_touch(f))
            staged[name] = f

        def run_seq(name):
            seq = index.sequences[name]
            group = seq.object_groups[0]
            frames = staged[name]
            probs = ev._eval_object_group(
                index, seq, frames, group, meta_params, key, None,
                support_img=frames[group.support_frame],
            )
            return unpack_mask_bits(np.asarray(thresh_pack(probs)),
                                    probs.shape[-1])

        run_seq("seq00")  # warmup/compile
        times = []
        for name in ("seq01", "seq02", "seq03"):
            t0 = time.perf_counter()
            run_seq(name)
            times.append(time.perf_counter() - t0)
        fps = T / float(np.median(times))
        js = [
            ev.eval_sequence(index, n, meta_params, key)["J_mean"]
            for n in ("seq01", "seq02", "seq03")
        ]
        return {
            "early_stop_patience": patience,
            "fps": round(fps, 4),
            "vs_baseline": round(fps / BASELINE_FPS, 3),
            "J_mean": round(float(np.mean(js)), 4),
            "times_s": [round(t, 3) for t in times],
        }

    rows = [measure(0), measure(10)]
    out = {
        "metric": "earlystop_ab_480p_e-OSVOS-50-OnA",
        "rows": rows,
        "fps_overhead_pct": round(
            100 * (rows[0]["fps"] - rows[1]["fps"]) / rows[0]["fps"], 2
        ),
        "J_delta": round(rows[1]["J_mean"] - rows[0]["J_mean"], 4),
        "note": "patience>0 adds a masked tree-select latch per step; "
                "static shapes mean no steps are actually skipped on TPU, "
                "so this measures pure latch overhead vs any J change from "
                "freezing at the loss plateau. Reference default is also "
                "off (cfgs/meta.yaml:98).",
    }
    print(json.dumps(out), flush=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_EARLYSTOP.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
