"""YouTube-VOS-layout protocol at scale on the real chip (ROADMAP gap 4).

tests/test_e2e_ytvos_disk.py rehearses the YT-VOS layout at 64 px on the
CPU mesh; this drives it at NATIVE heterogeneous resolutions on the TPU:
a valid/ tree of 6 videos across 3 native resolutions (two share the
(512,896) bucket under eval_pad_multiple=64), timestamp stems at the real
5-frame annotation stride, and MID-SEQUENCE objects (every odd video's
second object enters at stem index 2 and gets its own support frame —
/root/reference/src/data/youtube.py:131-175). The full chain is the
user-facing one: files → YouTubeVOSIndex → native decode → per-group
one-shot fine-tune → merged palette-PNG export → native J/F → official
submission zip (utils/submission.py; reference evaluate.py:332-342).

Records per-video J/F, cold+warm fps, the compiled-program count (fresh
persistent cache, min-compile-time 0 — proving compiles are bounded by
buckets, not by native shapes), and the submission-zip entry count.

Writes BENCH_YTVOS.json. Run:
  nohup python scripts/tpu_ytvos_480p.py > /tmp/ytvos480.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_ap = argparse.ArgumentParser()
_ap.add_argument("--videos", type=int, default=6)
_ap.add_argument("--frames", type=int, default=25)
_ap.add_argument("--pad-multiple", type=int, default=64)
_ap.add_argument("--epochs", type=int, default=50)
_ap.add_argument("--ona", action="store_true",
                 help="flagship OnA protocol (tracking via 5-frame "
                      "pseudo-GT refits; the no-OnA default loses "
                      "far-moving objects from a random init)")
_ap.add_argument("--out-suffix", default="",
                 help="artifact name suffix (e.g. _ONA) so protocol "
                      "variants don't overwrite each other")
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

    from e_osvos_tpu.data.synthetic_disk import build_ytvos_tree

    cache = ARGS.cache_dir or tempfile.mkdtemp(prefix="jaxcache_ytvos_")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from e_osvos_tpu.cli import evaluate as eval_cli
    from e_osvos_tpu.data.datasets import YouTubeVOSIndex
    from e_osvos_tpu.utils.submission import (
        package_ytvos_submission,
        ytvos_frame_names,
    )

    work = tempfile.mkdtemp(prefix="ytvos480_")
    tree = os.path.join(work, "YouTube-VOS")
    meta = build_ytvos_tree(tree, num_videos=ARGS.videos,
                            t_frames=ARGS.frames)
    print(f"tree at {tree}: " + json.dumps(meta), flush=True)

    base_args = [
        "with",
        "datasets.val.name=YouTube-VOS",
        "datasets.val.split=valid",
        f"datasets.val.root={tree}",
        "data_cfg.multi_object=single_id",
        "data_cfg.init_hw=[480,854]",
        "parent_model.architecture=DeepLabV3Plus",
        "parent_model.encoder=resnet50",
        "parent_model.backbone_norm=frozen_bn",
        "parent_model.output_stride=16",
        "parent_model.dtype=bfloat16",
        f"num_epochs.eval={ARGS.epochs}",
        f"eval_pad_multiple={ARGS.pad_multiple}",
    ]
    if ARGS.ona:
        base_args += [
            "eval_online_adapt.step=5",
            "eval_online_adapt.num_epochs=10",
            "eval_online_adapt.min_prop=0.75",
            "eval_ona_window_bucket=4",
        ]
    else:
        base_args += ["eval_online_adapt.step=0"]
    if ARGS.ckpt:
        base_args += [f"meta_optim_model_file={ARGS.ckpt}"]

    def count_cache() -> int:
        return sum(len(fs) for _, _, fs in os.walk(cache))

    # snapshot pre-existing entries so pass-1/pass-2 counts are DELTAS and
    # keep their program-count-bound meaning under a reused --cache-dir
    cache_pre = count_cache()

    result = {
        "experiment": "ytvos_layout_480p",
        "protocol": f"e-OSVOS-{ARGS.epochs}{'-OnA' if ARGS.ona else ''} "
                    f"single_id pad_multiple={ARGS.pad_multiple}",
        "init": ("meta:" + os.path.basename(ARGS.ckpt)) if ARGS.ckpt
                else "random",
        "videos": meta,
        "cache_preexisting_entries": cache_pre,
        "status": "running",
    }

    def dump():
        name = f"BENCH_YTVOS{ARGS.out_suffix}.json"
        with open(os.path.join(_REPO, name), "w") as f:
            json.dump(result, f, indent=1)

    dump()
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
            "fps_per_seq": {r["seq"]: round(r["fps"], 3) for r in seqs},
            "fps_median": round(
                float(np.median([r["fps"] for r in seqs])), 3
            ),
        }
        if pass_i == 1:
            result["compiled_programs_pass1"] = count_cache() - cache_pre
        else:
            result["compiled_programs_pass2_new"] = (
                count_cache() - cache_pre - result["compiled_programs_pass1"]
            )
        dump()
        print(json.dumps(result[f"pass{pass_i}"]), flush=True)

    # official submission packaging off the warm pass: arcnames must use
    # the 5-stride timestamp stems, not dense frame indices
    idx = YouTubeVOSIndex(tree, split="valid", multi_object="single_id")
    names = {s: ytvos_frame_names(idx, s) for s in idx.sequences}
    zpath = os.path.join(work, "submission.zip")
    n = package_ytvos_submission(
        os.path.join(work, "run_p2", "preds"), zpath, frame_names=names
    )
    with zipfile.ZipFile(zpath) as zf:
        arcs = zf.namelist()
    ok = sorted(arcs) == sorted(
        f"Annotations/{s}/{stem}.png"
        for s, st in names.items() for stem in st
    )
    result["submission"] = {
        "entries": n, "arcnames_are_stems": bool(ok),
        "example": sorted(arcs)[0] if arcs else None,
    }
    result["status"] = "done"
    dump()
    print(json.dumps(result["submission"]), flush=True)


if __name__ == "__main__":
    main()
