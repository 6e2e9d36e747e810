"""Breadth protocol: many sequences, heterogeneous resolutions, bounded
compiles (round-3 verdict item 3).

The largest prior end-to-end disk run was 2 sequences at one resolution;
DAVIS-2017 val is 30 sequences and YT-VOS validates at heterogeneous
native resolutions (/root/reference/src/data/youtube.py:58-109). This
drives a 10-sequence disk tree — 6 native resolutions, 1-3 objects each
(data/synthetic_disk.py::build_breadth_tree) — through the SAME user CLI
(cli/evaluate) with resolution bucketing on (eval_pad_multiple=64), and
records:

* mean J / F over all sequences (files -> native decode -> fine-tune ->
  OnA -> PNG export -> native scoring);
* cold (pass 1, compiles included) and WARM (pass 2) per-sequence fps;
* the COMPILED-PROGRAM COUNT, measured by pointing this process at a
  FRESH persistent compile-cache directory with the min-compile-time
  threshold at 0 and counting entries after pass 1 — proving compiles
  are bounded by (2 buckets x 3 object counts), not by the 18 raw
  (resolution x object-count) combinations.

Writes BENCH_BREADTH.json. Run:
  nohup python scripts/tpu_breadth_eval.py > /tmp/breadth.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_ap = argparse.ArgumentParser()
_ap.add_argument("--seqs", type=int, default=10)
_ap.add_argument("--frames", type=int, default=25)
_ap.add_argument("--ona", action="store_true",
                 help="flagship OnA protocol (default: e-OSVOS-50 no-OnA "
                      "— OnA multiplies compile count by window variants)")
_ap.add_argument("--pad-multiple", type=int, default=64)
_ap.add_argument("--out-suffix", default="",
                 help="suffix for the artifact name (e.g. _ONA writes "
                      "BENCH_BREADTH_ONA.json) so protocol variants "
                      "don't overwrite each other")
_ap.add_argument("--cache-dir", default=None,
                 help="persistent compile-cache dir to share across "
                      "runs (default: fresh tempdir so the pass-1 "
                      "entry count is a clean program-count bound; "
                      "pre-existing entries are snapshotted so the "
                      "counts stay deltas either way)")
_ap.add_argument("--ckpt", default=None,
                 help="meta checkpoint from scripts/exp_meta_480p_tpu.py "
                      "(learned init + per-neuron lrs); default = random "
                      "init. Loads via the eval CLI's meta_optim_model_file "
                      "path (cli/common.py::resolve_meta_params).")
ARGS = _ap.parse_args()

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import numpy as np

    from e_osvos_tpu.data.synthetic_disk import build_breadth_tree

    # fresh persistent cache => program count is countable
    cache = ARGS.cache_dir or tempfile.mkdtemp(prefix="jaxcache_breadth_")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from e_osvos_tpu.cli import evaluate as eval_cli

    work = tempfile.mkdtemp(prefix="breadth_")
    tree = os.path.join(work, "DAVIS")
    meta = build_breadth_tree(tree, num_sequences=ARGS.seqs,
                              t_frames=ARGS.frames)
    print(f"tree at {tree}: "
          + json.dumps({k: v for k, v in meta.items()}), flush=True)
    resolutions = sorted({tuple(v["hw"]) for v in meta.values()})
    obj_counts = sorted({v["objects"] for v in meta.values()})

    base_args = [
        "with",
        "datasets.val.name=DAVIS-2017",
        "datasets.val.split=val",
        f"datasets.val.root={tree}",
        "data_cfg.multi_object=single_id",
        "data_cfg.init_hw=[480,854]",
        "parent_model.architecture=DeepLabV3Plus",
        "parent_model.encoder=resnet50",
        "parent_model.backbone_norm=frozen_bn",
        "parent_model.output_stride=16",
        "parent_model.dtype=bfloat16",
        "num_epochs.eval=50",
        f"eval_pad_multiple={ARGS.pad_multiple}",
    ]
    if ARGS.ona:
        base_args += [
            "eval_online_adapt.step=5",
            "eval_online_adapt.num_epochs=10",
            "eval_online_adapt.min_prop=0.75",
            f"eval_ona_window_bucket=4",
        ]

    if ARGS.ckpt:
        base_args += [f"meta_optim_model_file={ARGS.ckpt}"]

    def count_cache() -> int:
        return sum(len(fs) for _, _, fs in os.walk(cache))

    # snapshot pre-existing entries so pass-1/pass-2 counts are DELTAS and
    # keep their program-count-bound meaning under a reused --cache-dir
    cache_pre = count_cache()

    result = {
        "experiment": "breadth_eval",
        "protocol": ("e-OSVOS-50-OnA" if ARGS.ona else "e-OSVOS-50")
        + f" pad_multiple={ARGS.pad_multiple}",
        "init": ("meta:" + os.path.basename(ARGS.ckpt)) if ARGS.ckpt
                else "random",
        "sequences": meta,
        "native_resolutions": resolutions,
        "object_counts": obj_counts,
        "cache_preexisting_entries": cache_pre,
        "status": "running",
    }

    def dump():
        name = f"BENCH_BREADTH{ARGS.out_suffix}.json"
        with open(os.path.join(_REPO, name), "w") as f:
            json.dump(result, f, indent=1)

    dump()
    import time

    for pass_i in (1, 2):
        out = os.path.join(work, f"run_p{pass_i}")
        t0 = time.time()
        eval_cli.main(base_args + [
            f"save_dir={out}", f"save_preds={out}/preds",
        ])
        wall = time.time() - t0
        rows = [json.loads(l)
                for l in open(os.path.join(out, "eval_metrics.jsonl"))]
        seqs = [r for r in rows if r["event"] == "eval_seq"]
        total = [r for r in rows if r["event"] == "eval_total"][0]
        result[f"pass{pass_i}"] = {
            "J_mean": round(total["J_mean"], 4),
            "F_mean": round(total["F_mean"], 4),
            "num_sequences": total["num_sequences"],
            "wall_s": round(wall, 1),
            "fps_per_seq": {
                r["seq"]: round(r["fps"], 3) for r in seqs
            },
            "fps_median": round(
                float(np.median([r["fps"] for r in seqs])), 3
            ),
        }
        if pass_i == 1:
            n = count_cache() - cache_pre
            combos = sorted({(tuple(v["hw"]), v["objects"])
                             for v in meta.values()})
            result["compiled_programs_pass1"] = n
            result["program_bound_note"] = (
                f"{n} new persistent-cache entries after the cold pass over "
                f"{len(combos)} realized (resolution x object-count) combos "
                f"({len(resolutions)} native resolutions, "
                f"{len(obj_counts)} object counts); bucketing bounds "
                "big-program compiles by 2 buckets x 3 object counts."
            )
        else:
            result["compiled_programs_pass2_new"] = (
                count_cache() - cache_pre - result["compiled_programs_pass1"]
            )
        dump()
        print(json.dumps(result[f"pass{pass_i}"]), flush=True)

    result["status"] = "done"
    dump()


if __name__ == "__main__":
    main()
