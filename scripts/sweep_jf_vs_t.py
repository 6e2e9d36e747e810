"""J&F-vs-T: the accuracy axis of the reference's paper figure.

Round-3 verdict item 2: BENCH_SWEEP.json carried the RUNTIME axis of the
e-OSVOS-T curve only (s/frame per fine-tune-step count T); the reference's
figure pairs it with J&F per T (/root/reference/src/visualization.ipynb
cell 5; BASELINE.md row 10: J&F 62.3 -> 74.6 over T=1..500 on DAVIS-2017
val). This script runs utils/analysis.py::sweep_fine_tune_steps with the
meta-trained 480p checkpoint (scripts/exp_meta_480p_tpu.py) over held-out
480x854 sequences at T in {1,5,10,20,50,100,500} and MERGES the J/F/JF
columns into the matching T rows of BENCH_SWEEP.json (runtime columns are
left untouched — they were measured under the dual stream/resident
protocol documented in PERF.md; this run's own wall clock is recorded
separately as s_per_frame_jf_run for transparency).

Protocol: held-out synthetic sequences (seed=100, disjoint from the
checkpoint's training seeds) at the DAVIS eval geometry, 67 frames (the
DAVIS-2017 val average — same length the runtime sweep used). With
--hard, the distractor/occluder/multi-object held-out set (seed=200) is
used instead and rows go to a "hard" sub-key.

Usage:
  nohup python scripts/sweep_jf_vs_t.py --ckpt /tmp/meta480_ckpt_r4/last_meta_iter.ckpt \
      > /tmp/sweep_jf.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

_ap = argparse.ArgumentParser()
_ap.add_argument("--ckpt", default=None,
                 help="meta checkpoint (exp_meta_480p_tpu save format); "
                      "default = random-init meta params (rows then land "
                      "under 'random_init' for the uplift comparison)")
_ap.add_argument("--steps", type=int, nargs="+",
                 default=[1, 5, 10, 20, 50, 100, 500])
_ap.add_argument("--seqs", type=int, default=2)
_ap.add_argument("--frames", type=int, default=67)
_ap.add_argument("--hard", action="store_true",
                 help="use the hard held-out set (distractors/occluders/"
                      "2 objects, seed=200)")
ARGS = _ap.parse_args()

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    from flax import serialization

    from e_osvos_tpu.data.synthetic import SyntheticVOSIndex
    from e_osvos_tpu.data.transforms import AugmentConfig
    from e_osvos_tpu.engine import OneShotConfig, OneShotEvaluator
    from e_osvos_tpu.meta_optim import MetaOptimConfig, init_meta_params
    from e_osvos_tpu.models import DeepLabV3Plus
    from e_osvos_tpu.utils.analysis import sweep_fine_tune_steps

    model = DeepLabV3Plus(
        num_classes=1, arch="resnet50", backbone_norm="frozen_bn",
        output_stride=16, dtype=jnp.bfloat16,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 480, 480, 3), jnp.float32)
    )
    meta_cfg = MetaOptimConfig(lr_hierarchy_level="neuron", init_lr=1e-3,
                               learn_model_init=True, use_log_init_lr=False)
    meta_params = init_meta_params(meta_cfg, params)
    tag = "random_init"
    if ARGS.ckpt:
        with open(ARGS.ckpt, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        meta_params = serialization.from_state_dict(
            meta_params, raw["meta_params"]
        )
        tag = "meta"

    if ARGS.hard:
        index = SyntheticVOSIndex(
            num_sequences=ARGS.seqs, num_frames=ARGS.frames, size=(480, 854),
            num_objects=2, distractors=2, occluders=1, contrast=0.6,
            seed=200, name_prefix="hard",
        )
    else:
        index = SyntheticVOSIndex(
            num_sequences=ARGS.seqs, num_frames=ARGS.frames, size=(480, 854),
            num_objects=1, seed=100, name_prefix="held",
        )

    def make_evaluator(T: int) -> OneShotEvaluator:
        return OneShotEvaluator(
            model.apply, meta_cfg,
            OneShotConfig(num_epochs=T, batch_size=3,
                          loss_func="cross_entropy_and_dice",
                          augment=AugmentConfig()),
        )

    rows = sweep_fine_tune_steps(
        make_evaluator, index, sorted(index.sequences), meta_params,
        jax.random.PRNGKey(5), steps=ARGS.steps,
    )
    for r in rows:
        print(json.dumps(r), flush=True)

    # merge J/F columns into the matching T rows of BENCH_SWEEP.json
    path = os.path.join(_REPO, "BENCH_SWEEP.json")
    sweep = json.load(open(path)) if os.path.exists(path) else []
    by_t = {e["T"]: e for e in sweep}
    prefix = ("hard_" if ARGS.hard else "") + (
        "" if tag == "meta" else "random_init_"
    )
    for r in rows:
        e = by_t.setdefault(r["fine_tune_steps"],
                            {"T": r["fine_tune_steps"]})
        e[prefix + "J_mean"] = round(r["J_mean"], 4)
        e[prefix + "F_mean"] = round(r["F_mean"], 4)
        e[prefix + "JF_mean"] = round(r["JF_mean"], 4)
        e[prefix + "s_per_frame_jf_run"] = round(r["time_per_frame"], 4)
    merged = [by_t[t] for t in sorted(by_t)]
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"merged {len(rows)} rows ({prefix or 'meta'}) into {path}",
          flush=True)


if __name__ == "__main__":
    main()
