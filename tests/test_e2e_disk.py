"""Disk-backed DAVIS-layout end-to-end protocol rehearsal.

Everything else in the suite drives the evaluators from the in-memory
synthetic fixture; these tests run the FULL real-data path the way a user
with DAVIS on disk would: JPEG/palette-PNG files → DAVISIndex → native
C++ decode (data/native.py prefetch pool, with PIL fallback) → one-shot
fine-tune (+ online adaptation with pseudo-GT) → merged-label PNG export →
J/F scoring — through the same CLI invocation as the reference's eval
modus (/root/reference/README.md:76-83, src/util/evaluate.py).

Both architectures are covered: the dense DeepLab path and the detection
Mask R-CNN path (the reference default, cfgs/meta.yaml:70).
"""

import json

import numpy as np
import pytest
from PIL import Image

FRAMES = 5
HW = 64  # MaskRCNN FPN needs H, W divisible by the deepest stride (32)

_PALETTE = [0, 0, 0, 128, 0, 0, 0, 128, 0] + [0] * 759


def _render(t: int, objects: int, rng: np.random.RandomState):
    """Moving-square frame + palette-id label, textured enough that JPEG
    round-trips keep the objects distinguishable."""
    img = rng.randint(40, 80, (HW, HW, 3), np.uint8)
    lbl = np.zeros((HW, HW), np.uint8)
    for o in range(objects):
        x = 4 + 6 * t
        y = 8 + 24 * o
        img[y:y + 14, x:x + 14] = (220 - 60 * o, 60 + 120 * o, 60)
        lbl[y:y + 14, x:x + 14] = o + 1
    return img, lbl


@pytest.fixture(scope="module")
def davis_disk_tree(tmp_path_factory):
    """DAVIS-2017 val tree: bear (1 object), dogs (2 objects), 5 frames."""
    root = tmp_path_factory.mktemp("davis") / "DAVIS"
    rng = np.random.RandomState(0)
    for seq, n_obj in [("bear", 1), ("dogs", 2)]:
        jd = root / "JPEGImages" / "480p" / seq
        ad = root / "Annotations" / "480p" / seq
        jd.mkdir(parents=True)
        ad.mkdir(parents=True)
        for t in range(FRAMES):
            img, lbl = _render(t, n_obj, rng)
            Image.fromarray(img).save(jd / f"{t:05d}.jpg", quality=95)
            im = Image.fromarray(lbl, mode="P")
            im.putpalette(_PALETTE)
            im.save(ad / f"{t:05d}.png")
    sets = root / "ImageSets" / "2017"
    sets.mkdir(parents=True)
    (sets / "val.txt").write_text("bear\ndogs\n")
    return str(root)


def _common_argv(tree, tmp_path):
    return [
        "with",
        "datasets.val.name=DAVIS-2017",
        "datasets.val.split=val",
        f"datasets.val.root={tree}",
        "data_cfg.multi_object=single_id",
        f"data_cfg.init_hw=[{HW},{HW}]",
        "parent_model.encoder=resnet10",
        "parent_model.backbone_norm=group4",
        "parent_model.dtype=float32",
        f"save_dir={tmp_path}",
        f"save_preds={tmp_path}/preds",
    ]


def _read_metrics(tmp_path):
    lines = [json.loads(l) for l in
             (tmp_path / "eval_metrics.jsonl").read_text().splitlines()]
    seqs = {l["seq"]: l for l in lines if l["event"] == "eval_seq"}
    total = [l for l in lines if l["event"] == "eval_total"]
    return seqs, total


@pytest.mark.slow
class TestDavisDiskEndToEnd:
    def test_dense_with_online_adaptation(self, davis_disk_tree, tmp_path):
        """DeepLab one-shot + OnA (pseudo-GT windows) on disk-backed
        sequences; merged palette predictions exported per frame."""
        from e_osvos_tpu.cli import evaluate as eval_cli

        eval_cli.main(_common_argv(davis_disk_tree, tmp_path) + [
            "parent_model.architecture=DeepLabV3",
            "parent_model.decoder_norm_layer=group4",
            "num_epochs.eval=2",
            "eval_online_adapt.step=2",
            "eval_online_adapt.num_epochs=1",
        ])
        seqs, total = _read_metrics(tmp_path)
        assert set(seqs) == {"bear", "dogs"}
        assert total and total[0]["num_sequences"] == 2
        for row in seqs.values():
            assert np.isfinite(row["J_mean"]) and 0.0 <= row["J_mean"] <= 1.0
            assert row["time_per_frame"] > 0
        # merged predictions: palette PNG per frame, ids bounded by the
        # sequence's object count (dogs has two objects in single_id mode)
        for seq, n_obj in [("bear", 1), ("dogs", 2)]:
            for t in range(FRAMES):
                p = tmp_path / "preds" / seq / f"{t:05d}.png"
                assert p.exists()
                arr = np.asarray(Image.open(p))
                assert arr.shape == (HW, HW)
                assert set(np.unique(arr)) <= set(range(n_obj + 1))

    def test_detection_mask_rcnn(self, davis_disk_tree, tmp_path):
        """Mask R-CNN (the reference's default architecture) through the
        same disk-backed CLI path, with the proposal-augmentation tracking
        prior active (EXTEND, the reference default)."""
        from e_osvos_tpu.cli import evaluate as eval_cli

        eval_cli.main(_common_argv(davis_disk_tree, tmp_path) + [
            "parent_model.architecture=MaskRCNN",
            "parent_model.rpn.anchor_sizes=[8,16,32,64,128]",
            "parent_model.rpn.pre_nms_top_n=64",
            "parent_model.rpn.post_nms_top_n=32",
            "parent_model.rpn.batch_size_per_image=32",
            "parent_model.roi.batch_size_per_image=16",
            "parent_model.detections_per_img=2",
            "num_epochs.eval=1",
            "data_cfg.batch_sizes.train=1",
            "eval_init_j=true",  # detection init_J baseline (evaluate.py:123-127)
        ])
        seqs, total = _read_metrics(tmp_path)
        assert set(seqs) == {"bear", "dogs"}
        import json

        rows = [json.loads(l) for l in
                (tmp_path / "eval_metrics.jsonl").read_text().splitlines()]
        init_rows = [r for r in rows if r["event"] == "init_eval_seq"]
        assert {r["seq"] for r in init_rows} == {"bear", "dogs"}
        assert total and total[0]["num_sequences"] == 2
        for t in range(FRAMES):
            p = tmp_path / "preds" / "dogs" / f"{t:05d}.png"
            arr = np.asarray(Image.open(p))
            assert arr.shape == (HW, HW)
            assert set(np.unique(arr)) <= {0, 1, 2}


@pytest.fixture(scope="module")
def hetero_disk_tree(tmp_path_factory):
    """Two sequences at DIFFERENT native resolutions (YT-VOS validates at
    native size, youtube.py:58-109) — neither divisible by the model
    stride, so this also proves bucketing makes odd geometries runnable."""
    root = tmp_path_factory.mktemp("hetero") / "DAVIS"
    rng = np.random.RandomState(3)
    for seq, (h, w) in [("small", (44, 60)), ("tiny", (42, 58))]:
        jd = root / "JPEGImages" / "480p" / seq
        ad = root / "Annotations" / "480p" / seq
        jd.mkdir(parents=True)
        ad.mkdir(parents=True)
        for t in range(FRAMES):
            img = rng.randint(40, 80, (h, w, 3), np.uint8)
            lbl = np.zeros((h, w), np.uint8)
            x = 4 + 5 * t
            img[10:24, x:x + 14] = (220, 60, 60)
            lbl[10:24, x:x + 14] = 1
            Image.fromarray(img).save(jd / f"{t:05d}.jpg", quality=95)
            im = Image.fromarray(lbl, mode="P")
            im.putpalette(_PALETTE)
            im.save(ad / f"{t:05d}.png")
    sets = root / "ImageSets" / "2017"
    sets.mkdir(parents=True)
    (sets / "val.txt").write_text("small\ntiny\n")
    return str(root)


@pytest.mark.slow
class TestHeterogeneousResolutionCLI:
    def test_bucketed_eval_two_resolutions(self, hetero_disk_tree, tmp_path):
        """eval_pad_multiple buckets both native resolutions to (48, 64):
        ONE set of compiled programs serves both sequences, predictions
        export at each sequence's ORIGINAL geometry, J/F finite."""
        from e_osvos_tpu.cli import evaluate as eval_cli

        eval_cli.main([
            "with",
            "datasets.val.name=DAVIS-2017",
            "datasets.val.split=val",
            f"datasets.val.root={hetero_disk_tree}",
            "data_cfg.multi_object=single_id",
            "data_cfg.init_hw=[48,64]",
            "parent_model.encoder=resnet10",
            "parent_model.backbone_norm=group4",
            "parent_model.dtype=float32",
            "parent_model.architecture=DeepLabV3",
            "parent_model.decoder_norm_layer=group4",
            "num_epochs.eval=2",
            "eval_online_adapt.step=2",
            "eval_online_adapt.num_epochs=1",
            "eval_pad_multiple=16",
            f"save_dir={tmp_path}",
            f"save_preds={tmp_path}/preds",
        ])
        seqs, total = _read_metrics(tmp_path)
        assert set(seqs) == {"small", "tiny"}
        assert total and total[0]["num_sequences"] == 2
        for row in seqs.values():
            assert np.isfinite(row["J_mean"]) and 0.0 <= row["J_mean"] <= 1.0
        # predictions come back at each sequence's native geometry
        for seq, (h, w) in [("small", (44, 60)), ("tiny", (42, 58))]:
            for t in range(FRAMES):
                arr = np.asarray(Image.open(
                    tmp_path / "preds" / seq / f"{t:05d}.png"
                ))
                assert arr.shape == (h, w)
