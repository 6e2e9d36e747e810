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

Writes BENCH_DISK_480P.json rows {J_mean, F_mean, fps} per sequence.

Usage:  nohup python scripts/tpu_e2e_disk_480p.py > /tmp/e2e480.log &
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

H, W, T = 480, 854, 67  # DAVIS 480p geometry, val-average sequence length

_PALETTE = [0, 0, 0, 128, 0, 0, 0, 128, 0] + [0] * 759


def _texture(rng, shade):
    """Low-frequency textured background so JPEG round-trips look like
    photographs rather than flat synthetic fills."""
    coarse = rng.randint(0, 255, (H // 8 + 1, W // 8 + 1, 3), np.uint8)
    img = np.asarray(
        Image.fromarray(coarse).resize((W, H), Image.BILINEAR), np.float32
    )
    return (0.35 * img + 0.65 * shade).astype(np.uint8)


def _blob_mask(cx, cy, rx, ry, angle):
    """Rotated-ellipse object mask (irregular boundary lengths exercise the
    boundary-F machinery more than axis-aligned squares)."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    ca, sa = np.cos(angle), np.sin(angle)
    u = (xx - cx) * ca + (yy - cy) * sa
    v = -(xx - cx) * sa + (yy - cy) * ca
    return (u / rx) ** 2 + (v / ry) ** 2 <= 1.0


def build_tree(root):
    rng = np.random.RandomState(7)
    specs = {
        # one object, translating + slowly scaling
        "drift": [dict(color=(200, 60, 40), x0=140, y0=200, dx=8.0, dy=1.2,
                       rx=70, ry=45, drx=0.35)],
        # two objects crossing paths (multi-object merge + per-object OnA)
        "crossing": [
            dict(color=(40, 170, 220), x0=120, y0=130, dx=8.5, dy=2.4,
                 rx=55, ry=40, drx=0.0),
            dict(color=(230, 200, 50), x0=680, y0=330, dx=-7.5, dy=-1.8,
                 rx=48, ry=62, drx=0.2),
        ],
    }
    for seq, objs in specs.items():
        jd = os.path.join(root, "JPEGImages", "480p", seq)
        ad = os.path.join(root, "Annotations", "480p", seq)
        os.makedirs(jd)
        os.makedirs(ad)
        shade = rng.randint(60, 120, 3).astype(np.float32)
        for t in range(T):
            img = _texture(rng, shade)
            lbl = np.zeros((H, W), np.uint8)
            for oid, o in enumerate(objs, start=1):
                m = _blob_mask(
                    o["x0"] + o["dx"] * t, o["y0"] + o["dy"] * t,
                    o["rx"] + o["drx"] * t, o["ry"], angle=0.03 * t,
                )
                for c in range(3):
                    img[..., c] = np.where(
                        m,
                        (0.8 * o["color"][c] + 0.2 * img[..., c]).astype(
                            np.uint8
                        ),
                        img[..., c],
                    )
                lbl[m] = oid
            Image.fromarray(img).save(
                os.path.join(jd, f"{t:05d}.jpg"), quality=92
            )
            im = Image.fromarray(lbl, mode="P")
            im.putpalette(_PALETTE)
            im.save(os.path.join(ad, f"{t:05d}.png"))
    sets = os.path.join(root, "ImageSets", "2017")
    os.makedirs(sets)
    with open(os.path.join(sets, "val.txt"), "w") as f:
        f.write("drift\ncrossing\n")


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_bench_cache"
    )
    from e_osvos_tpu.cli import evaluate as eval_cli

    work = tempfile.mkdtemp(prefix="davis480_")
    tree = os.path.join(work, "DAVIS")
    build_tree(tree)
    print(f"tree built at {tree}", flush=True)

    out = os.path.join(work, "run")
    eval_cli.main([
        "with",
        "datasets.val.name=DAVIS-2017",
        "datasets.val.split=val",
        f"datasets.val.root={tree}",
        "data_cfg.multi_object=single_id",
        f"data_cfg.init_hw=[{H},{W}]",
        # flagship bench.py configuration (PERF.md optimization ledger)
        "parent_model.architecture=DeepLabV3Plus",
        "parent_model.encoder=resnet50",
        "parent_model.backbone_norm=frozen_bn",
        "parent_model.output_stride=16",
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
    bench = []
    for r in rows:
        if r["event"] == "eval_seq":
            bench.append({
                "seq": r["seq"],
                "J_mean": round(r["J_mean"], 4),
                "F_mean": round(r["F_mean"], 4),
                "fps_incl_finetune": round(r["fps"], 3),
            })
        if r["event"] == "eval_total":
            bench.append({
                "seq": "MEAN", "J_mean": round(r["J_mean"], 4),
                "F_mean": round(r["F_mean"], 4),
                "num_sequences": r["num_sequences"],
            })
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_DISK_480P.json"), "w") as f:
        json.dump(bench, f, indent=1)
    print(json.dumps(bench, indent=1), flush=True)
    # keep the exported PNGs around for inspection
    print(f"preds at {out}/preds", flush=True)


if __name__ == "__main__":
    main()
