"""Native C++ loader tests: decode parity vs PIL, prefetch pool
(SURVEY.md §2.4 native data path)."""

import numpy as np
import pytest
from PIL import Image

from e_osvos_tpu.data import native
from e_osvos_tpu.utils.png import davis_palette

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native loader not built"
)


@pytest.fixture()
def jpeg_file(tmp_path):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (37, 53, 3), np.uint8)
    p = tmp_path / "frame.jpg"
    Image.fromarray(img).save(p, quality=95)
    return str(p), img


@pytest.fixture()
def indexed_png(tmp_path):
    label = np.zeros((25, 31), np.uint8)
    label[5:12, 7:20] = 1
    label[15:20, 2:9] = 2
    label[0, 0] = 255
    im = Image.fromarray(label, mode="P")
    im.putpalette(davis_palette().flatten().tolist())
    p = tmp_path / "label.png"
    im.save(p)
    return str(p), label


class TestDecode:
    def test_jpeg_matches_pil(self, jpeg_file):
        path, _ = jpeg_file
        ours = native.decode_jpeg(path)
        ref = np.asarray(Image.open(path).convert("RGB"))
        assert ours.shape == ref.shape
        # independent IDCT implementations may differ by a few LSBs
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 2

    def test_png_indexed_exact(self, indexed_png):
        path, label = indexed_png
        ours = native.decode_png_indexed(path)
        np.testing.assert_array_equal(ours, label)

    def test_missing_file_raises(self):
        with pytest.raises(IOError):
            native.decode_jpeg("/nonexistent/x.jpg")


class TestPrefetch:
    def test_pool_roundtrip(self, jpeg_file, indexed_png):
        jpath, _ = jpeg_file
        ppath, label = indexed_png
        loader = native.PrefetchLoader(num_threads=2, num_slots=4,
                                       max_hw=(64, 64))
        loader.submit(0, jpath, kind=0)
        loader.submit(1, ppath, kind=1)
        img = loader.wait(0)
        lab = loader.wait(1)
        assert img.shape == (37, 53, 3)
        np.testing.assert_array_equal(lab, label)
        # slots are reusable
        loader.submit(0, jpath, kind=0)
        assert loader.wait(0).shape == (37, 53, 3)
        loader.close()

    def test_failure_reported(self, tmp_path):
        loader = native.PrefetchLoader(num_threads=1, num_slots=1,
                                       max_hw=(8, 8))
        loader.submit(0, str(tmp_path / "missing.jpg"), kind=0)
        with pytest.raises(IOError):
            loader.wait(0)
        loader.close()


class TestDatasetIntegration:
    def test_load_image_uses_native(self, jpeg_file):
        from e_osvos_tpu.data.datasets import load_image

        path, _ = jpeg_file
        img = load_image(path)
        assert img.shape == (37, 53, 3)

    def test_load_label_uses_native(self, indexed_png):
        from e_osvos_tpu.data.datasets import load_label

        path, label = indexed_png
        np.testing.assert_array_equal(load_label(path), label)


class TestLoadFrames:
    def test_prefetched_sequence_matches_sequential(self, tmp_path):
        from PIL import Image as PILImage
        from e_osvos_tpu.data.datasets import DAVISIndex
        from e_osvos_tpu.data.loader import load_frames

        # small DAVIS-layout tree with jpgs
        root = tmp_path / "DAVIS"
        img_dir = root / "JPEGImages" / "480p" / "seq"
        ann_dir = root / "Annotations" / "480p" / "seq"
        img_dir.mkdir(parents=True)
        ann_dir.mkdir(parents=True)
        rng = np.random.RandomState(0)
        T = 6
        for t in range(T):
            arr = rng.randint(0, 255, (22, 30, 3), np.uint8)
            PILImage.fromarray(arr).save(img_dir / f"{t:05d}.jpg", quality=95)
        lab = np.zeros((22, 30), np.uint8)
        lab[4:10, 5:15] = 1
        im = PILImage.fromarray(lab, mode="P")
        im.putpalette(davis_palette().flatten().tolist())
        im.save(ann_dir / "00000.png")

        index = DAVISIndex(str(root), sequences=["seq"])
        frames = load_frames(index, "seq")
        ref = np.stack([index.get_image("seq", t) for t in range(T)])
        np.testing.assert_array_equal(frames, ref)

    def test_capacity_guard(self, tmp_path, jpeg_file):
        path, _ = jpeg_file  # 37x53 frame
        loader = native.PrefetchLoader(num_threads=1, num_slots=1,
                                       max_hw=(8, 8))  # too small
        loader.submit(0, path, kind=0)
        with pytest.raises(IOError):
            loader.wait(0)
        loader.close()
