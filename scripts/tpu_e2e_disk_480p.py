"""Full-protocol 480p run on disk-backed DAVIS-layout data (TPU).

Round-1 review noted that every 480p number to that point ran from the
in-memory synthetic fixture, so the native decode path, OnA pseudo-GT
logic, and PNG export had never processed realistic full-resolution masks
together. This script closes that: it materializes a DAVIS-2017-layout
tree on disk (JPEG frames + palette-PNG annotations at 480x854, textured
scenes, multi-object sequence included), then drives the SAME CLI a user
with real DAVIS runs (/root/reference/README.md:76-83):

  JPEG/PNG files -> DAVISIndex -> native C++ decode (cpp/vos_loader.cc)
  -> e-OSVOS-50-OnA one-shot fine-tune + online adaptation -> merged
  palette-PNG export -> native J/F scoring,

with the flagship configuration of bench.py (DeepLabV3Plus / resnet50 /
frozen-BN / os16 / bf16, 50 fine-tune steps, OnA every 5 frames x 10).

Writes BENCH_DISK_480P.json rows {J_mean, F_mean, fps} per sequence,
keyed by variant (arch / output stride / pass number) so repeated
invocations accumulate: `--stride 8` records the os8 J delta (verdict
item: the reference trunk is os8), `--arch MaskRCNN` records the
reference's default architecture through the same disk chain
(/root/reference/src/util/evaluate.py:294-359), and `--passes 2` runs the
CLI twice so the second pass reports the WARM-cache fps of the real
file→decode→device→PNG pipeline (what bench.py's in-memory timing skips).

Usage:  nohup python scripts/tpu_e2e_disk_480p.py [--stride 8]
            [--arch MaskRCNN] [--passes 2] > /tmp/e2e480.log &
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

_ap = argparse.ArgumentParser()
_ap.add_argument("--arch", default="DeepLabV3Plus",
                 choices=["DeepLabV3Plus", "MaskRCNN"])
_ap.add_argument("--stride", type=int, default=16, choices=[8, 16],
                 help="DeepLab output stride (ignored for MaskRCNN)")
_ap.add_argument("--passes", type=int, default=1,
                 help="CLI invocations; pass 2+ reports warm-cache fps")
_ap.add_argument("--parent-iters", type=int, default=600,
                 help="MaskRCNN only: supervised detection parent-training "
                      "iterations on the tree's train split before eval. "
                      "The reference seeds Mask R-CNN from torchvision's "
                      "COCO weights (helper_func.py:339-346); with no COCO "
                      "in this environment, a from-scratch parent on "
                      "held-out synthetic sequences is the honest "
                      "equivalent — random init detects nothing (J=0).")
_ap.add_argument("--tree", default=None,
                 help="reuse an existing disk tree (skip building)")
_ap.add_argument("--parent-ckpt", default=None,
                 help="MaskRCNN only: reuse this parent checkpoint instead "
                      "of training one (--parent-iters is then only a tag)")
_ap.add_argument("--meta-ckpt", default=None,
                 help="meta-optimizer checkpoint (meta_optim_model_file): "
                      "eval fine-tunes with the LEARNED init + lrs instead "
                      "of constant-lr SGD from the parent init — the "
                      "reference's actual eval configuration "
                      "(evaluate.py:119-121 always loads a meta state)")
_ap.add_argument("--tag", default=None,
                 help="row-key override for BENCH_DISK_480P.json")
_ap.add_argument("--per-frame-j", action="store_true",
                 help="also record the per-frame J curve (computed from "
                      "the exported PNGs vs the tree's GT) — separates "
                      "mask-quality failures (uniformly low) from "
                      "propagation drift (decaying)")
ARGS = _ap.parse_args()

from e_osvos_tpu.data.synthetic_disk import (  # noqa: E402
    H480 as H,
    T480 as T,
    W480 as W,
    build_480p_tree as build_tree,
)


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_bench_cache"
    )
    from e_osvos_tpu.cli import evaluate as eval_cli

    detect = ARGS.arch == "MaskRCNN"
    work = tempfile.mkdtemp(prefix="davis480_")
    if ARGS.tree:
        tree = ARGS.tree
        print(f"reusing tree at {tree}", flush=True)
    else:
        tree = os.path.join(work, "DAVIS")
        build_tree(tree, with_train=detect and ARGS.parent_iters > 0)
        print(f"tree built at {tree}", flush=True)

    if detect:
        arch_args = [
            # reference default architecture (cfgs/meta.yaml:70) with the
            # proposal-augmentation tracking prior (EXTEND) and single_id
            # detections (evaluate.py:106-107). backbone_norm=group, not
            # the reference's frozen_bn: frozen BN stats only exist when a
            # COCO checkpoint provides them — at random init frozen_bn is
            # an identity and a from-scratch parent cannot train.
            "parent_model.architecture=MaskRCNN",
            "parent_model.encoder=resnet50",
            "parent_model.backbone_norm=group",
            "parent_model.detections_per_img=1",
        ]
        variant = "maskrcnn"
        if ARGS.parent_ckpt:
            arch_args.append(f"parent_model.checkpoint={ARGS.parent_ckpt}")
            print(f"reusing parent: {ARGS.parent_ckpt}", flush=True)
        elif ARGS.parent_iters > 0:
            from e_osvos_tpu.cli import train_parent as tp_cli

            pdir = os.path.join(work, "parent")
            tp_cli.main([
                "with",
                "datasets.train.name=DAVIS-2017",
                "datasets.train.split=train",
                f"datasets.train.root={tree}",
                "parent_model.architecture=MaskRCNN",
                "parent_model.encoder=resnet50",
                "parent_model.backbone_norm=group",
                "parent_model.dtype=bfloat16",
                f"parent.num_iters={ARGS.parent_iters}",
                "parent.batch_size=4",
                "parent.lr=1e-4",
                "parent.max_objects=2",
                "parent.snapshot_interval=100000",
                "data_cfg.crop_sizes.train=[480,480]",
                f"save_dir={pdir}",
            ])
            ckpt = os.path.join(pdir, "parent_final.ckpt")
            arch_args.append(f"parent_model.checkpoint={ckpt}")
            print(f"detection parent trained: {ckpt}", flush=True)
    else:
        arch_args = [
            # flagship bench.py configuration (PERF.md optimization ledger)
            "parent_model.architecture=DeepLabV3Plus",
            "parent_model.encoder=resnet50",
            "parent_model.backbone_norm=frozen_bn",
            f"parent_model.output_stride={ARGS.stride}",
        ]
        variant = f"dense_os{ARGS.stride}"
    if ARGS.meta_ckpt:
        arch_args.append(f"meta_optim_model_file={ARGS.meta_ckpt}")
    if ARGS.tag:
        variant = ARGS.tag

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench_path = os.path.join(repo, "BENCH_DISK_480P.json")
    bench = {}
    if os.path.exists(bench_path):
        old = json.load(open(bench_path))
        # round-2 format was a flat row list (dense os16, cold pass)
        bench = old if isinstance(old, dict) else {"dense_os16_pass1": old}

    for pass_i in range(1, ARGS.passes + 1):
        out = os.path.join(work, f"run_p{pass_i}")
        eval_cli.main([
            "with",
            "datasets.val.name=DAVIS-2017",
            "datasets.val.split=val",
            f"datasets.val.root={tree}",
            "data_cfg.multi_object=single_id",
            f"data_cfg.init_hw=[{H},{W}]",
            *arch_args,
            "parent_model.dtype=bfloat16",
            # e-OSVOS-50-OnA protocol
            "num_epochs.eval=50",
            "eval_online_adapt.step=5",
            "eval_online_adapt.num_epochs=10",
            "eval_online_adapt.min_prop=0.75",
            f"save_dir={out}",
            f"save_preds={out}/preds",
        ])

        rows = [json.loads(l) for l in
                open(os.path.join(out, "eval_metrics.jsonl"))]
        entry = []
        for r in rows:
            if r["event"] == "eval_seq":
                entry.append({
                    "seq": r["seq"],
                    "J_mean": round(r["J_mean"], 4),
                    "F_mean": round(r["F_mean"], 4),
                    "fps_incl_finetune": round(r["fps"], 3),
                })
            if r["event"] == "eval_total":
                entry.append({
                    "seq": "MEAN", "J_mean": round(r["J_mean"], 4),
                    "F_mean": round(r["F_mean"], 4),
                    "num_sequences": r["num_sequences"],
                })
        if ARGS.per_frame_j and pass_i == 1:
            # per-frame J from the exported PNGs vs the tree's GT: a flat
            # low curve = per-frame mask quality; a decaying curve =
            # propagation/pseudo-GT drift
            for seq in sorted(os.listdir(os.path.join(out, "preds"))):
                gt_dir = os.path.join(tree, "Annotations", "480p", seq)
                pd_dir = os.path.join(out, "preds", seq)
                curve = []
                for t in range(1, T):
                    gt = np.asarray(Image.open(
                        os.path.join(gt_dir, f"{t:05d}.png")))
                    pred = np.asarray(Image.open(
                        os.path.join(pd_dir, f"{t:05d}.png")))
                    js = []
                    for oid in np.unique(gt[gt > 0]):
                        g, p = gt == oid, pred == oid
                        u = (g | p).sum()
                        js.append(float((g & p).sum() / u) if u else 1.0)
                    curve.append(round(float(np.mean(js)), 4) if js else 1.0)
                entry.append({"seq": seq, "per_frame_J": curve})
        bench[f"{variant}_pass{pass_i}"] = entry
        with open(bench_path, "w") as f:
            json.dump(bench, f, indent=1)
        print(f"[{variant} pass {pass_i}] " + json.dumps(entry), flush=True)
        # keep the exported PNGs around for inspection
        print(f"preds at {out}/preds", flush=True)


if __name__ == "__main__":
    main()
