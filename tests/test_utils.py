"""Utility-layer tests: jsonl metrics, checkpoint atomicity, PNG export,
debug overlays, split generation (SURVEY.md §2.6/§5.4/§5.5)."""

import json
import os

import numpy as np
import pytest

from e_osvos_tpu.data.splits import category_balanced_split, write_split_files
from e_osvos_tpu.utils import (
    MetricsLogger,
    Timer,
    davis_palette,
    draw_boxes,
    load_checkpoint,
    load_indexed_png,
    overlay_masks,
    save_checkpoint,
    save_indexed_png,
)


class TestMetricsLogger:
    def test_jsonl_roundtrip(self, tmp_path):
        p = tmp_path / "m.jsonl"
        log = MetricsLogger(path=str(p), echo=False)
        log.log("eval_seq", step=3, J_mean=0.5, seq="blackswan",
                arr=np.array([1.0, 2.0]))
        log.close()
        rec = json.loads(p.read_text().strip())
        assert rec["event"] == "eval_seq"
        assert rec["step"] == 3
        assert rec["J_mean"] == 0.5
        assert rec["arr"] == [1.0, 2.0]

    def test_timer_phases(self):
        t = Timer()
        t.start("a")
        t.stop("a")
        t.start("a")
        t.stop("a")
        assert t.counts["a"] == 2
        assert t["a"] >= 0


class TestCheckpoint:
    def test_roundtrip_and_metadata(self, tmp_path):
        state = {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
                 "nested": {"b": np.ones(4)}}
        path = str(tmp_path / "ck" / "x.ckpt")
        save_checkpoint(path, state, metadata={"meta_iter": 7})
        target = {"w": np.zeros((2, 3), np.float32),
                  "nested": {"b": np.zeros(4)}}
        restored, meta = load_checkpoint(path, target)
        np.testing.assert_array_equal(restored["w"], state["w"])
        assert meta["meta_iter"] == 7
        # no tmp file left behind (atomic rename)
        assert not os.path.exists(path + ".tmp")


class TestPNG:
    def test_indexed_roundtrip(self, tmp_path):
        label = np.zeros((10, 12), np.uint8)
        label[2:5, 3:9] = 2
        p = str(tmp_path / "m.png")
        save_indexed_png(p, label)
        np.testing.assert_array_equal(load_indexed_png(p), label)

    def test_palette_davis_colors(self):
        pal = davis_palette()
        np.testing.assert_array_equal(pal[0], [0, 0, 0])
        np.testing.assert_array_equal(pal[1], [128, 0, 0])
        np.testing.assert_array_equal(pal[2], [0, 128, 0])


class TestOverlays:
    def test_overlay_changes_masked_pixels_only(self):
        img = np.full((8, 8, 3), 100, np.uint8)
        label = np.zeros((8, 8), np.int32)
        label[2:5, 2:5] = 1
        out = overlay_masks(img, label, alpha=0.5, draw_contour=False)
        assert (out[0, 0] == 100).all()
        assert not (out[3, 3] == 100).all()

    def test_draw_boxes_edges(self):
        img = np.zeros((20, 20, 3), np.uint8)
        out = draw_boxes(img, [[2, 3, 10, 12]], color=(255, 0, 0))
        assert (out[3, 2:10, 0] == 255).all()
        assert (out[3:12, 2, 0] == 255).all()


class TestSplitGenerator:
    def _meta(self, tmp_path):
        videos = {}
        cats = ["cat", "dog", "rare"]
        counts = [30, 20, 3]
        i = 0
        for c, n in zip(cats, counts):
            for _ in range(n):
                videos[f"v{i:03d}"] = {
                    "objects": {"1": {"category": c, "frames": ["00000"]}}
                }
                i += 1
        p = tmp_path / "meta.json"
        p.write_text(json.dumps({"videos": videos}))
        return str(p)

    def test_balanced_and_disjoint(self, tmp_path):
        meta = self._meta(tmp_path)
        train, val = category_balanced_split(meta, num_val=9, seed=1)
        assert len(val) == 9
        assert len(train) == 53 - 9
        assert not set(train) & set(val)
        # rare category (3 seqs) must appear in the val split (round-robin)
        rare = {f"v{i:03d}" for i in range(50, 53)}
        assert rare & set(val)

    def test_write_files(self, tmp_path):
        meta = self._meta(tmp_path)
        train, val = category_balanced_split(meta, num_val=5, seed=1)
        write_split_files(str(tmp_path), train, val)
        lines = (tmp_path / "train_dev_random_123_val.txt").read_text().split()
        assert lines == val


class TestSubmissionPackaging:
    def test_ytvos_zip_layout(self, tmp_path):
        import zipfile

        from e_osvos_tpu.utils.submission import package_ytvos_submission

        preds = tmp_path / "preds"
        for seq, n in [("vid_a", 2), ("vid_b", 1)]:
            (preds / seq).mkdir(parents=True)
            for t in range(n):
                save_indexed_png(str(preds / seq / f"{t:05d}.png"),
                                 np.zeros((4, 5), np.uint8))
        out = tmp_path / "sub.zip"
        n = package_ytvos_submission(str(preds), str(out),
                                     frame_names={"vid_a": ["00000", "00005"]})
        assert n == 3
        names = set(zipfile.ZipFile(out).namelist())
        assert names == {
            "Annotations/vid_a/00000.png",
            "Annotations/vid_a/00005.png",
            "Annotations/vid_b/00000.png",
        }


class TestMakeReport:
    def test_report_from_artifacts(self, tmp_path):
        """scripts/make_report.py — the CLI analogue of the reference's
        visualization.ipynb results figures."""
        import json
        import subprocess
        import sys

        repo = tmp_path / "repo"
        repo.mkdir()
        (repo / "BENCH_x.json").write_text(json.dumps([
            {"metric": "fps_test", "value": 5.0, "unit": "frames/sec",
             "vs_baseline": 14.3}]))
        (repo / "BENCH_SWEEP.json").write_text(json.dumps([
            {"T": 1, "s_per_frame": 0.05, "fps": 20.0,
             "ref_s_per_frame": 0.14, "speedup_vs_ref": 2.8}]))
        run = tmp_path / "run"
        run.mkdir()
        rows = [
            {"event": "meta_train", "meta_loss": 1.0, "lr_mean": 1e-3,
             "lr_std": 0.0, "lr_per_tensor": {"params/a/kernel": 1e-3}},
            {"event": "eval", "J_mean": 0.5, "init_J_mean": 0.1},
        ]
        (run / "metrics.jsonl").write_text(
            "\n".join(json.dumps(r) for r in rows))
        out = tmp_path / "REPORT.md"
        script = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "make_report.py")
        subprocess.run(
            [sys.executable, script, "--repo", str(repo), "--run-dir",
             str(run), "--out", str(out)],
            check=True, env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        text = out.read_text()
        assert "fps_test" in text and "14.3" in text
        assert "e-OSVOS-T runtime curve" in text
        assert "init_J" in text and "per-tensor" in text
