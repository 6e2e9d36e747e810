"""Disk-backed YouTube-VOS-layout end-to-end protocol rehearsal.

test_e2e_disk.py covers the DAVIS layout; this file drives the
YouTube-VOS layout through the same evaluate CLI: timestamp-stem JPEG
frames + sparse palette-PNG annotations + ``meta.json`` per-object frame
ranges (reference /root/reference/src/data/youtube.py:58-185) →
YouTubeVOSIndex → one-shot fine-tune per object group (objects appearing
MID-SEQUENCE get their own support frame, youtube.py:131-143) → merged
palette-PNG export → official submission zip
(utils/submission.py; reference evaluate.py:332-342).
"""

import json
import zipfile

import numpy as np
import pytest
from PIL import Image

HW = 64
STEMS = ["00000", "00005", "00010", "00015", "00020"]  # YT-VOS 5-stride
FRAMES = len(STEMS)

_PALETTE = [0, 0, 0, 128, 0, 0, 0, 128, 0] + [0] * 759


def _render(t: int, objects, rng: np.random.RandomState):
    """Moving-square frame + palette-id label; ``objects`` maps object id →
    first frame index (ids absent before their first frame, like YT-VOS)."""
    img = rng.randint(40, 80, (HW, HW, 3), np.uint8)
    lbl = np.zeros((HW, HW), np.uint8)
    for oid, first in objects.items():
        if t < first:
            continue
        x = 4 + 6 * t
        y = 8 + 24 * (oid - 1)
        img[y:y + 14, x:x + 14] = (220 - 60 * oid, 120 * oid - 60, 60)
        lbl[y:y + 14, x:x + 14] = oid
    return img, lbl


@pytest.fixture(scope="module")
def ytvos_disk_tree(tmp_path_factory):
    """valid/ split tree: video1 (1 object from frame 0), video2 (object 1
    from frame 0, object 2 appearing mid-sequence at frame 2)."""
    root = tmp_path_factory.mktemp("ytvos")
    base = root / "valid"
    rng = np.random.RandomState(3)
    specs = {"video1": {1: 0}, "video2": {1: 0, 2: 2}}
    meta = {"videos": {}}
    for seq, objects in specs.items():
        jd = base / "JPEGImages" / seq
        ad = base / "Annotations" / seq
        jd.mkdir(parents=True)
        ad.mkdir(parents=True)
        for t, stem in enumerate(STEMS):
            img, lbl = _render(t, objects, rng)
            Image.fromarray(img).save(jd / f"{stem}.jpg", quality=95)
            im = Image.fromarray(lbl, mode="P")
            im.putpalette(_PALETTE)
            im.save(ad / f"{stem}.png")
        meta["videos"][seq] = {
            "objects": {
                str(oid): {"frames": STEMS[first:]}
                for oid, first in objects.items()
            }
        }
    (base / "meta.json").write_text(json.dumps(meta))
    return str(root)


def _read_metrics(tmp_path):
    lines = [json.loads(l) for l in
             (tmp_path / "eval_metrics.jsonl").read_text().splitlines()]
    seqs = {l["seq"]: l for l in lines if l["event"] == "eval_seq"}
    total = [l for l in lines if l["event"] == "eval_total"]
    return seqs, total


@pytest.mark.slow
class TestYouTubeVOSDiskEndToEnd:
    def test_valid_split_with_mid_sequence_object(
        self, ytvos_disk_tree, tmp_path
    ):
        """Full CLI run on the YT-VOS layout; the mid-sequence object must
        get its own support frame and contribute no labels before it."""
        from e_osvos_tpu.cli import evaluate as eval_cli
        from e_osvos_tpu.data.datasets import YouTubeVOSIndex

        # index-level contract first: object groups + support frames come
        # from meta.json (youtube.py:131-175)
        idx = YouTubeVOSIndex(
            ytvos_disk_tree, split="valid", multi_object="single_id"
        )
        assert set(idx.sequences) == {"video1", "video2"}
        v2 = idx.sequences["video2"]
        assert [g.object_ids for g in v2.object_groups] == [(1,), (2,)]
        assert [g.support_frame for g in v2.object_groups] == [0, 2]

        eval_cli.main([
            "with",
            "datasets.val.name=YouTube-VOS",
            "datasets.val.split=valid",
            f"datasets.val.root={ytvos_disk_tree}",
            "data_cfg.multi_object=single_id",
            f"data_cfg.init_hw=[{HW},{HW}]",
            "parent_model.architecture=DeepLabV3",
            "parent_model.encoder=resnet10",
            "parent_model.backbone_norm=group4",
            "parent_model.decoder_norm_layer=group4",
            "parent_model.dtype=float32",
            "num_epochs.eval=2",
            "eval_online_adapt.step=0",
            f"save_dir={tmp_path}",
            f"save_preds={tmp_path}/preds",
        ])
        seqs, total = _read_metrics(tmp_path)
        assert set(seqs) == {"video1", "video2"}
        assert total and total[0]["num_sequences"] == 2
        for row in seqs.values():
            assert np.isfinite(row["J_mean"]) and 0.0 <= row["J_mean"] <= 1.0

        # merged predictions: one palette PNG per frame; object 2 (group
        # label 2) must be absent before its first annotated frame
        for t in range(FRAMES):
            p = tmp_path / "preds" / "video2" / f"{t:05d}.png"
            assert p.exists()
            arr = np.asarray(Image.open(p))
            assert arr.shape == (HW, HW)
            labels = set(np.unique(arr))
            assert labels <= {0, 1, 2}
            if t < 2:
                assert 2 not in labels
        # support frames carry the ground-truth mask verbatim
        sf2 = np.asarray(Image.open(
            tmp_path / "preds" / "video2" / "00002.png"))
        gt2 = np.asarray(Image.open(
            f"{ytvos_disk_tree}/valid/Annotations/video2/{STEMS[2]}.png"))
        assert ((sf2 == 2) == (gt2 == 2)).all()

        # official submission packaging: arcnames use the timestamp stems
        from e_osvos_tpu.utils.submission import (
            package_ytvos_submission,
            ytvos_frame_names,
        )

        names = {s: ytvos_frame_names(idx, s) for s in idx.sequences}
        zpath = tmp_path / "submission.zip"
        n = package_ytvos_submission(
            str(tmp_path / "preds"), str(zpath), frame_names=names
        )
        assert n == 2 * FRAMES
        with zipfile.ZipFile(zpath) as zf:
            arcs = sorted(zf.namelist())
        assert arcs == sorted(
            f"Annotations/{s}/{stem}.png"
            for s in ("video1", "video2")
            for stem in STEMS
        )
