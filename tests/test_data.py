"""Data layer tests: on-device transforms, synthetic fixture, DAVIS indexer
on a temp directory tree (SURVEY.md §4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from e_osvos_tpu.data import (
    DAVISIndex,
    SyntheticVOSIndex,
    binarize_label,
    transforms,
)


class TestTransforms:
    def test_normalize_modes(self):
        img = jnp.full((4, 4, 3), 255.0)
        unit = transforms.normalize(img, "unit")
        np.testing.assert_allclose(np.asarray(unit), 1.0)
        davis = transforms.normalize(img, "davis")
        np.testing.assert_allclose(
            np.asarray(davis[0, 0]),
            255.0 - np.asarray(transforms.DAVIS_MEAN_RGB),
            rtol=1e-6,
        )

    def test_identity_affine(self):
        img = jnp.arange(5 * 7 * 3, dtype=jnp.float32).reshape(5, 7, 3)
        label = (jnp.arange(5 * 7) % 2).reshape(5, 7).astype(jnp.int32)
        eye = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        out_img, out_label = transforms.affine_warp(img, label, eye)
        np.testing.assert_allclose(np.asarray(out_img), np.asarray(img), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(out_label), np.asarray(label))

    def test_flip_matrix_reverses_columns(self):
        img = jnp.arange(4 * 4 * 1, dtype=jnp.float32).reshape(4, 4, 1)
        label = jnp.arange(16).reshape(4, 4).astype(jnp.int32)
        flip = jnp.array([[-1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        out_img, out_label = transforms.affine_warp(img, label, flip)
        np.testing.assert_allclose(
            np.asarray(out_img[:, :, 0]), np.asarray(img[:, ::-1, 0]), atol=1e-4
        )
        np.testing.assert_array_equal(
            np.asarray(out_label), np.asarray(label[:, ::-1])
        )

    def test_augment_border_becomes_ignore(self):
        """A strong zoom-out must introduce 255-labeled border pixels."""
        cfg = transforms.AugmentConfig(
            scale_min=0.5, scale_max=0.5, rot_deg=0.0, flip_prob=0.0,
            brightness=0, contrast=0, saturation=0,
        )
        img = jnp.ones((16, 16, 3)) * 100.0
        label = jnp.ones((16, 16), jnp.int32)
        out_img, out_label = transforms.augment_frame(
            jax.random.key(0), img, label, cfg
        )
        assert (np.asarray(out_label) == 255).any()
        assert (np.asarray(out_label) == 1).any()

    def test_support_batch_augmentations_differ(self):
        img = jnp.asarray(
            np.random.RandomState(0).randint(0, 255, (16, 16, 3)), jnp.float32
        )
        label = jnp.zeros((16, 16), jnp.int32)
        imgs, labels = transforms.augment_support_batch(
            jax.random.key(1), img, label, 3
        )
        assert imgs.shape == (3, 16, 16, 3)
        assert labels.shape == (3, 16, 16)
        assert not np.allclose(np.asarray(imgs[0]), np.asarray(imgs[1]))

    def test_task_frames_share_flip_and_color(self):
        """Per-task deterministic mode (reference
        random_frame_transform_per_task, meta_tasksets.py:109-136): one flip
        decision and one color-jitter draw shared by support and queries."""
        rng = np.random.RandomState(3)
        # values <= 180 so a 1.3x brightness never clips at 255 (clipping
        # would make the recovered per-frame factor content-dependent)
        img = jnp.asarray(rng.randint(1, 180, (16, 16, 3)), jnp.float32)
        q_imgs = jnp.asarray(rng.randint(1, 180, (2, 16, 16, 3)), jnp.float32)
        label = jnp.asarray(rng.randint(0, 2, (16, 16)), jnp.int32)
        q_labels = jnp.asarray(rng.randint(0, 2, (2, 16, 16)), jnp.int32)
        # geometry off, flip forced on: every frame must be exactly flipped
        # + identically color-jittered
        cfg = transforms.AugmentConfig(
            scale_min=1.0, scale_max=1.0, rot_deg=0.0, flip_prob=1.0,
            brightness=0.3, contrast=0.0, saturation=0.0,
        )
        s_i, s_l, q_i, q_l = transforms.augment_task_frames(
            jax.random.key(5), img, label, q_imgs, q_labels, cfg
        )
        np.testing.assert_array_equal(np.asarray(s_l), np.asarray(label[:, ::-1]))
        np.testing.assert_array_equal(np.asarray(q_l), np.asarray(q_labels[:, :, ::-1]))
        # shared brightness factor: recover it per frame, must be identical
        b_s = float(jnp.sum(s_i) / jnp.sum(img))
        b_q0 = float(jnp.sum(q_i[0]) / jnp.sum(q_imgs[0]))
        b_q1 = float(jnp.sum(q_i[1]) / jnp.sum(q_imgs[1]))
        assert abs(b_s - b_q0) < 1e-3 and abs(b_s - b_q1) < 1e-3
        assert abs(b_s - 1.0) > 1e-3  # jitter actually applied

    def test_task_frames_geometry_varies_per_frame(self):
        """The scale/rotate draw is per frame (reference caches per
        file_name), so two query frames of the same content must warp
        differently while flip/color stay shared."""
        img = jnp.asarray(
            np.random.RandomState(4).randint(0, 255, (16, 16, 3)), jnp.float32
        )
        q_imgs = jnp.stack([img, img])
        label = jnp.zeros((16, 16), jnp.int32)
        q_labels = jnp.zeros((2, 16, 16), jnp.int32)
        cfg = transforms.AugmentConfig(
            scale_min=0.6, scale_max=1.4, rot_deg=30.0, flip_prob=0.0,
            brightness=0.0, contrast=0.0, saturation=0.0,
        )
        _, _, q_i, _ = transforms.augment_task_frames(
            jax.random.key(2), img, label, q_imgs, q_labels, cfg
        )
        assert not np.allclose(np.asarray(q_i[0]), np.asarray(q_i[1]))

    def test_determinism_same_key(self):
        img = jnp.ones((8, 8, 3)) * 50
        label = jnp.zeros((8, 8), jnp.int32)
        a = transforms.augment_frame(jax.random.key(7), img, label)
        b = transforms.augment_frame(jax.random.key(7), img, label)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))

    def test_pad_to(self):
        img = jnp.ones((5, 6, 3))
        label = jnp.ones((5, 6), jnp.int32)
        pi, pl, valid = transforms.pad_to(img, label, (8, 8))
        assert pi.shape == (8, 8, 3)
        assert int(pl[7, 7]) == 255
        assert not bool(valid[7, 7]) and bool(valid[4, 5])

    def test_random_crop_shape(self):
        img = jnp.zeros((10, 12, 3))
        label = jnp.zeros((10, 12), jnp.int32)
        ci, cl = transforms.random_crop(jax.random.key(0), img, label, (4, 5))
        assert ci.shape == (4, 5, 3)
        assert cl.shape == (4, 5)

    def test_gaussian_blur_smooths_and_preserves_mean(self):
        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.randint(0, 255, (16, 16, 3)), jnp.float32)
        v_in = float(jnp.var(img))
        vars_out = []
        for s in range(5):
            out = transforms.gaussian_blur(jax.random.key(s), img, prob=1.0,
                                           sigma_max=1.0)
            assert out.shape == img.shape
            # (edge-replicate padding) roughly preserves the mean
            assert abs(float(jnp.mean(out)) - float(jnp.mean(img))) < 3.0
            # blur never ADDS high-frequency energy
            vars_out.append(float(jnp.var(out)))
            assert vars_out[-1] <= v_in * 1.001
        # sigma ~ U[0,1): most draws blur substantially on white noise
        assert min(vars_out) < 0.7 * v_in

    def test_gaussian_blur_prob_zero_identity(self):
        img = jnp.asarray(
            np.random.RandomState(1).randint(0, 255, (8, 8, 3)), jnp.float32
        )
        out = transforms.gaussian_blur(jax.random.key(0), img, prob=0.0,
                                       sigma_max=1.0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(img))

    def test_voc_parent_augment_translates_and_blurs(self):
        """The VOC preset (pascal_voc.py:86-96 stack): translation moves the
        object, blur path runs inside augment_frame without shape changes."""
        cfg = transforms.VOC_PARENT_AUGMENT
        img = jnp.zeros((32, 32, 3), jnp.float32)
        label = jnp.zeros((32, 32), jnp.int32)
        label = label.at[12:20, 12:20].set(1)
        img = img.at[12:20, 12:20].set(200.0)
        centers = []
        for s in range(6):
            _, out_label = transforms.augment_frame(
                jax.random.key(s), img, label, cfg
            )
            ys, xs = np.nonzero(np.asarray(out_label) == 1)
            if len(ys):
                centers.append((ys.mean(), xs.mean()))
        # across seeds the object center must move (translation is live)
        assert len(centers) >= 2
        assert np.std([c[0] for c in centers]) + np.std(
            [c[1] for c in centers]
        ) > 1.0


class TestSynthetic:
    def test_sequence_layout(self):
        idx = SyntheticVOSIndex(num_sequences=2, num_frames=3, num_objects=2)
        assert len(idx.sequences) == 2
        seq = idx.sequences["seq00"]
        assert len(seq) == 3
        assert seq.num_objects == 2
        assert len(seq.object_groups) == 2  # single_id mode
        img = idx.get_image("seq00", 0)
        label = idx.get_label("seq00", 0)
        assert img.shape == (64, 64, 3) and img.dtype == np.uint8
        assert set(np.unique(label)) <= {0, 1, 2}

    def test_object_moves(self):
        idx = SyntheticVOSIndex(num_sequences=1, num_frames=4, seed=3)
        l0 = idx.get_label("seq00", 0)
        l3 = idx.get_label("seq00", 3)
        assert (l0 == 1).sum() > 0 and (l3 == 1).sum() > 0
        assert not np.array_equal(l0, l3)

    def test_all_mode_single_group(self):
        idx = SyntheticVOSIndex(num_objects=3, multi_object="all")
        groups = idx.sequences["seq00"].object_groups
        assert len(groups) == 1
        assert groups[0].object_ids == (1, 2, 3)

    def test_hard_variant_defeats_color_keying(self):
        """Round-3 verdict item 8: the HARD held-out set must not be
        solvable by color separability alone — each target has same-color
        distractor shapes labeled 0, so a color-keyed predictor's IoU is
        bounded well below 1."""
        idx = SyntheticVOSIndex(
            num_sequences=2, num_frames=8, size=(96, 160), num_objects=2,
            distractors=2, occluders=1, contrast=0.6, seed=7,
            name_prefix="hard",
        )
        lbl0 = idx.get_label("hard00", 0)
        img0 = idx.get_image("hard00", 0).astype(np.float32)
        # support frame clean: both targets visible (occluders enter later)
        assert (lbl0 == 1).sum() > 50 and (lbl0 == 2).sum() > 50
        for oid in (1, 2):
            c = img0[lbl0 == oid].mean(axis=0)
            near = np.abs(img0 - c).sum(axis=-1) < 40
            tp = int((near & (lbl0 == oid)).sum())
            fp = int((near & (lbl0 == 0)).sum())
            # color-keyed IoU upper bound = tp / (tp + fp) — the distractors
            # must push it below 0.6
            assert fp > tp * 0.6, (tp, fp)
        # an occluder actually covers part of a target mid-sequence
        areas = [(idx.get_label("hard00", t) == 1).sum() for t in range(8)]
        assert min(areas) < 0.8 * areas[0]

    def test_hard_variant_default_unchanged(self):
        """The hard knobs must not perturb the default fixture's PRNG
        stream (every existing test/bench keys on it)."""
        a = SyntheticVOSIndex(num_sequences=1, num_frames=3, seed=3)
        b = SyntheticVOSIndex(num_sequences=1, num_frames=3, seed=3,
                              distractors=0, occluders=0, contrast=1.0)
        np.testing.assert_array_equal(
            a.get_image("seq00", 2), b.get_image("seq00", 2)
        )
        np.testing.assert_array_equal(
            a.get_label("seq00", 2), b.get_label("seq00", 2)
        )


class TestBinarize:
    def test_keep_ignore(self):
        label = np.array([[0, 1, 2], [255, 1, 0]], np.uint8)
        out = binarize_label(label, [1])
        np.testing.assert_array_equal(
            out, np.array([[0, 1, 0], [255, 1, 0]], np.uint8)
        )

    def test_group_of_two(self):
        label = np.array([[0, 1, 2]], np.uint8)
        out = binarize_label(label, [1, 2])
        np.testing.assert_array_equal(out, np.array([[0, 1, 1]], np.uint8))


@pytest.fixture()
def davis_tree(tmp_path):
    """Minimal DAVIS-2017 directory tree with 2 sequences x 3 frames."""
    root = tmp_path / "DAVIS"
    for seq, n_obj in [("bear", 1), ("dogs", 2)]:
        jd = root / "JPEGImages" / "480p" / seq
        ad = root / "Annotations" / "480p" / seq
        jd.mkdir(parents=True)
        ad.mkdir(parents=True)
        for t in range(3):
            Image.fromarray(
                np.random.RandomState(t).randint(0, 255, (32, 48, 3), dtype=np.uint8)
            ).save(jd / f"{t:05d}.jpg")
            lbl = np.zeros((32, 48), np.uint8)
            for o in range(n_obj):
                lbl[5 + 8 * o : 10 + 8 * o, 10:20] = o + 1
            im = Image.fromarray(lbl, mode="P")
            im.putpalette([0, 0, 0, 128, 0, 0, 0, 128, 0] + [0] * 759)
            im.save(ad / f"{t:05d}.png")
    sets = root / "ImageSets" / "2017"
    sets.mkdir(parents=True)
    (sets / "val.txt").write_text("bear\ndogs\n")
    return str(root)


class TestDAVISIndex:
    def test_index(self, davis_tree):
        idx = DAVISIndex(davis_tree, split="val")
        assert set(idx.sequences) == {"bear", "dogs"}
        bear = idx.sequences["bear"]
        assert len(bear) == 3
        assert bear.num_objects == 1
        dogs = idx.sequences["dogs"]
        assert dogs.num_objects == 2
        assert len(dogs.object_groups) == 2

    def test_all_mode(self, davis_tree):
        idx = DAVISIndex(davis_tree, split="val", multi_object="all")
        assert len(idx.sequences["dogs"].object_groups) == 1
        assert idx.sequences["dogs"].object_groups[0].object_ids == (1, 2)

    def test_decode(self, davis_tree):
        idx = DAVISIndex(davis_tree, split="val")
        img = idx.get_image("bear", 1)
        assert img.shape == (32, 48, 3)
        lbl = idx.get_label("dogs", 2)
        assert set(np.unique(lbl)) == {0, 1, 2}

    def test_explicit_sequences(self, davis_tree):
        idx = DAVISIndex(davis_tree, sequences=["bear"])
        assert list(idx.sequences) == ["bear"]


class TestShippedSplits:
    """The repo ships the reference's exact benchmark sequence lists
    (data/DAVIS-*/, data/YouTube-VOS/; reference /root/reference/data/) and
    the indexers fall back to them when the dataset root has no split file."""

    def test_davis2017_val_is_exact_protocol_list(self, tmp_path):
        from e_osvos_tpu.data.datasets import shipped_split_path

        # a bare root with data but no ImageSets: split comes from data/
        p = shipped_split_path("DAVIS-2017", "val")
        assert p is not None
        from e_osvos_tpu.data.datasets import read_split_file

        names = read_split_file(p)
        assert len(names) == 30
        assert "blackswan" in names and "bike-packing" in names

    def test_split_counts(self):
        from e_osvos_tpu.data.datasets import read_split_file, shipped_split_path

        expected = {
            ("DAVIS-2016", "train"): 30,
            ("DAVIS-2016", "val"): 20,
            ("DAVIS-2017", "train"): 60,
            ("DAVIS-2017", "val"): 30,
            ("DAVIS-2017", "test-dev"): 30,
            ("YouTube-VOS", "train_dev_random_123_train"): 3271,
            ("YouTube-VOS", "train_dev_random_123_val"): 100,
            ("YouTube-VOS", "valid"): 507,
            ("YouTube-VOS", "valid-all-frames"): 507,
            ("YouTube-VOS", "test"): 541,
        }
        for (ds, split), n in expected.items():
            p = shipped_split_path(ds, split)
            assert p is not None, (ds, split)
            assert len(read_split_file(p)) == n, (ds, split)

    def test_youtube_derived_split_uses_train_dir(self, tmp_path, monkeypatch):
        """train_dev_random_123_* splits resolve through the shipped list and
        index the 'train' directory (reference generate_youtube_vos_splits.py
        semantics)."""
        import json as _json

        from PIL import Image

        from e_osvos_tpu.data import datasets as ds
        from e_osvos_tpu.data.datasets import YouTubeVOSIndex

        root = tmp_path / "ytvos"
        base = root / "train"
        meta = {"videos": {}}
        for name in ("vidA", "vidB", "vidC"):
            (base / "JPEGImages" / name).mkdir(parents=True)
            (base / "Annotations" / name).mkdir(parents=True)
            for t in range(2):
                fid = f"{t * 5:05d}"
                Image.fromarray(
                    np.zeros((8, 8, 3), np.uint8)
                ).save(base / "JPEGImages" / name / f"{fid}.jpg")
                lbl = np.zeros((8, 8), np.uint8)
                lbl[2:5, 2:5] = 1
                im = Image.fromarray(lbl, mode="P")
                im.putpalette([0, 0, 0, 128, 0, 0] + [0] * 762)
                im.save(base / "Annotations" / name / f"{fid}.png")
            meta["videos"][name] = {
                "objects": {"1": {"frames": ["00000", "00005"]}}
            }
        (base / "meta.json").write_text(_json.dumps(meta))
        split_dir = tmp_path / "splits" / "YouTube-VOS"
        split_dir.mkdir(parents=True)
        (split_dir / "train_dev_random_123_val_seqs.txt").write_text(
            "vidA\nvidC\n"
        )
        monkeypatch.setattr(ds, "SPLIT_DIR", str(tmp_path / "splits"))
        idx = YouTubeVOSIndex(str(root), split="train_dev_random_123_val")
        assert set(idx.sequences) == {"vidA", "vidC"}

    def test_davis_index_resolves_shipped_split(self, davis_tree):
        import shutil

        # remove the root's own split file: resolution must fall back to the
        # shipped DAVIS-2017 list (which the fixture's 2 seqs aren't in) —
        # prove the fallback fires by checking the error comes from indexing
        # a real protocol sequence, not from a missing split file
        shutil.rmtree(os.path.join(davis_tree, "ImageSets"))
        with pytest.raises(FileNotFoundError) as ei:
            DAVISIndex(davis_tree, split="val")
        assert "JPEGImages" in str(ei.value) or "bike-packing" in str(
            ei.value
        ), ei.value


class TestVOCIndex:
    def _make_voc(self, tmp_path):
        import os
        from PIL import Image
        from e_osvos_tpu.utils.png import davis_palette

        base = tmp_path / "VOCdevkit" / "VOC2012"
        (base / "JPEGImages").mkdir(parents=True)
        (base / "SegmentationClass").mkdir(parents=True)
        (base / "ImageSets" / "Segmentation").mkdir(parents=True)
        names = ["2007_000001", "2007_000002"]
        rng = np.random.RandomState(0)
        for n in names:
            img = rng.randint(0, 255, (30, 40, 3), np.uint8)
            Image.fromarray(img).save(base / "JPEGImages" / f"{n}.jpg")
            lab = np.zeros((30, 40), np.uint8)
            lab[5:15, 5:20] = 12  # some VOC class id
            lab[0, 0] = 255  # void
            im = Image.fromarray(lab, mode="P")
            im.putpalette(davis_palette().flatten().tolist())
            im.save(base / "SegmentationClass" / f"{n}.png")
        with open(base / "ImageSets" / "Segmentation" / "train.txt", "w") as f:
            f.write("\n".join(names))
        return str(tmp_path)

    def test_binary_labels_and_interface(self, tmp_path):
        from e_osvos_tpu.data.voc import VOC2012Index

        idx = VOC2012Index(self._make_voc(tmp_path), split="train")
        assert len(idx.sequences) == 2
        name = sorted(idx.sequences)[0]
        seq = idx.sequences[name]
        assert len(seq) == 1
        img = idx.get_image(name, 0)
        lab = idx.get_label(name, 0)
        assert img.shape == (30, 40, 3)
        # default void mode = background (the reference's stated intent,
        # pascal_voc.py:156)
        assert set(np.unique(lab)) <= {0, 1}
        assert lab[10, 10] == 1  # class id collapsed to fg
        assert lab[0, 0] == 0  # void → background

    def test_void_ignore_mode(self, tmp_path):
        from e_osvos_tpu.data.voc import VOC2012Index

        idx = VOC2012Index(self._make_voc(tmp_path), split="train",
                           void="ignore")
        name = sorted(idx.sequences)[0]
        lab = idx.get_label(name, 0)
        assert lab[0, 0] == 255  # void preserved as ignore
        assert lab[10, 10] == 1

    def test_fix_scale_crop(self, tmp_path):
        from e_osvos_tpu.data.voc import fix_scale_crop

        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (30, 40, 3), np.uint8)
        lab = np.zeros((30, 40), np.uint8)
        lab[10:20, 15:30] = 1
        out, olab = fix_scale_crop(img, lab, 24)
        # short edge (30) scaled to 24, center crop → square static shape
        assert out.shape == (24, 24, 3)
        assert olab.shape == (24, 24)
        assert set(np.unique(olab)) <= {0, 1}
        # the centered object survives the center crop
        assert olab.sum() > 0

    def test_build_indexes_dispatch(self, tmp_path):
        from e_osvos_tpu.cli.common import build_indexes
        from e_osvos_tpu.data.voc import VOC2012Index

        root = self._make_voc(tmp_path)
        cfg = {
            "datasets": {"train": {"name": "VOC2012", "split": "train",
                                   "root": root}},
            "voc": {"void": "ignore"},
        }
        (idx,) = build_indexes(cfg, "train")
        assert isinstance(idx, VOC2012Index)
        assert idx.void == "ignore"


class TestYouTubeVOSIndex:
    def _make_ytvos(self, tmp_path):
        import json
        from PIL import Image
        from e_osvos_tpu.utils.png import davis_palette

        base = tmp_path / "valid"
        for seq in ["vid_a"]:
            (base / "JPEGImages" / seq).mkdir(parents=True)
            (base / "Annotations" / seq).mkdir(parents=True)
        rng = np.random.RandomState(0)
        frames = ["00000", "00005", "00010", "00015"]
        for f in frames:
            img = rng.randint(0, 255, (24, 32, 3), np.uint8)
            Image.fromarray(img).save(base / "JPEGImages" / "vid_a" / f"{f}.jpg")
        # object 1 appears at frame 0, object 2 appears at frame 00010
        for f, ids in [("00000", [1]), ("00010", [1, 2])]:
            lab = np.zeros((24, 32), np.uint8)
            if 1 in ids:
                lab[2:8, 2:8] = 1
            if 2 in ids:
                lab[10:16, 10:20] = 2
            im = Image.fromarray(lab, mode="P")
            im.putpalette(davis_palette().flatten().tolist())
            im.save(base / "Annotations" / "vid_a" / f"{f}.png")
        meta = {
            "videos": {
                "vid_a": {
                    "objects": {
                        "1": {"category": "cat", "frames": ["00000", "00010"]},
                        "2": {"category": "dog", "frames": ["00010", "00015"]},
                    }
                }
            }
        }
        with open(base / "meta.json", "w") as f:
            json.dump(meta, f)
        return str(tmp_path)

    def test_per_object_support_frames(self, tmp_path):
        """YT-VOS objects appear mid-sequence: each group carries its own
        support frame (youtube.py:131-185 parity)."""
        from e_osvos_tpu.data.datasets import YouTubeVOSIndex

        idx = YouTubeVOSIndex(self._make_ytvos(tmp_path), split="valid",
                              multi_object="single_id")
        seq = idx.sequences["vid_a"]
        assert len(seq) == 4
        groups = {g.object_ids[0]: g.support_frame for g in seq.object_groups}
        assert groups == {1: 0, 2: 2}  # frame index 2 == "00010"
        # unannotated frames report None labels
        assert idx.get_label("vid_a", 1) is None
        assert idx.get_label("vid_a", 2) is not None

    def test_all_mode_groups_by_first_frame(self, tmp_path):
        from e_osvos_tpu.data.datasets import YouTubeVOSIndex

        idx = YouTubeVOSIndex(self._make_ytvos(tmp_path), split="valid",
                              multi_object="all")
        seq = idx.sequences["vid_a"]
        assert len(seq.object_groups) == 2
        assert seq.object_groups[0].object_ids == (1,)
        assert seq.object_groups[1].object_ids == (2,)


class TestPackedWarp:
    """affine_warp_packed == the generic warp on uint8-valued frames."""

    def test_matches_generic_warp(self):
        rs = np.random.RandomState(3)
        img = jnp.asarray(rs.randint(0, 256, (33, 41, 3)), jnp.float32)
        label = jnp.asarray(rs.randint(0, 3, (33, 41)), jnp.int32)
        theta = 0.3
        s = 1.2
        matrix = jnp.array(
            [[np.cos(theta) / s, np.sin(theta) / s, 1.5],
             [-np.sin(theta) / s, np.cos(theta) / s, -2.0]], jnp.float32
        )
        got_img, got_lab, inside = transforms.affine_warp_packed(
            img, label, matrix, compute_dtype=jnp.float32
        )
        want_img, want_lab = transforms.affine_warp(
            img, label, matrix, img_cval=0.0, label_cval=255.0
        )
        np.testing.assert_allclose(
            np.asarray(got_img), np.asarray(want_img), atol=1e-2
        )
        np.testing.assert_array_equal(np.asarray(got_lab), np.asarray(want_lab))
        # inside == some bilinear support
        assert np.asarray(inside).any()

    def test_identity_roundtrip(self):
        rs = np.random.RandomState(4)
        img = jnp.asarray(rs.randint(0, 256, (8, 8, 3)), jnp.float32)
        label = jnp.asarray(rs.randint(0, 2, (8, 8)), jnp.int32)
        eye = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        out_img, out_lab, inside = transforms.affine_warp_packed(
            img, label, eye, compute_dtype=jnp.float32
        )
        np.testing.assert_allclose(np.asarray(out_img), np.asarray(img), atol=1e-3)
        np.testing.assert_array_equal(np.asarray(out_lab), np.asarray(label))
        assert np.asarray(inside).all()


class TestBreadthTree:
    """data/synthetic_disk.py::build_breadth_tree — the heterogeneous-
    resolution protocol fixture (round-3 verdict item 3). Checks the
    on-disk layout is a valid DAVIS-2017 tree at MIXED native resolutions
    and that the advertised bucket math holds: with eval_pad_multiple=64
    the six native shapes collapse to exactly two padded buckets."""

    def test_layout_resolutions_and_bucketing(self, tmp_path):
        from e_osvos_tpu.data.synthetic_disk import build_breadth_tree

        root = str(tmp_path / "DAVIS")
        meta = build_breadth_tree(root, num_sequences=10, t_frames=3)
        assert len(meta) == 10
        # six distinct native resolutions, object counts cycle 1..3
        shapes = {tuple(v["hw"]) for v in meta.values()}
        assert len(shapes) == 6
        assert {v["objects"] for v in meta.values()} == {1, 2, 3}

        def bucket(hw, m=64):
            return tuple(-(-d // m) * m for d in hw)

        assert {bucket(s) for s in shapes} == {(512, 896), (384, 640)}

        idx = DAVISIndex(root=root, split="val", year="2017")
        assert len(idx.sequences) == 10
        for name, info in meta.items():
            img = idx.get_image(name, 0)
            lbl = idx.get_label(name, 0)
            assert img.shape[:2] == tuple(info["hw"])
            assert lbl.shape == tuple(info["hw"])
            # every advertised object id present in the support frame
            assert set(range(1, info["objects"] + 1)) <= set(
                np.unique(lbl[lbl > 0]).tolist()
            )


class TestYtvosTree:
    """data/synthetic_disk.py::build_ytvos_tree — the YT-VOS-layout
    at-scale protocol fixture (scripts/tpu_ytvos_480p.py). Checks the
    tree indexes through YouTubeVOSIndex with timestamp stems,
    mid-sequence support frames, and the advertised 2-bucket collapse
    under eval_pad_multiple=64."""

    def test_layout_stems_and_mid_sequence_objects(self, tmp_path):
        from e_osvos_tpu.data.datasets import YouTubeVOSIndex
        from e_osvos_tpu.data.synthetic_disk import build_ytvos_tree

        root = str(tmp_path / "YouTube-VOS")
        meta = build_ytvos_tree(root, num_videos=6, t_frames=4)
        assert len(meta) == 6
        shapes = {tuple(v["hw"]) for v in meta.values()}
        assert shapes == {(480, 854), (452, 838), (384, 640)}

        def bucket(hw, m=64):
            return tuple(-(-d // m) * m for d in hw)

        assert {bucket(s) for s in shapes} == {(512, 896), (384, 640)}

        idx = YouTubeVOSIndex(root, split="valid",
                              multi_object="single_id")
        assert set(idx.sequences) == set(meta)
        for name, info in meta.items():
            seq = idx.sequences[name]
            # 5-stride timestamp stems, not dense indices
            assert os.path.basename(seq.image_paths[1]) == "00005.jpg"
            groups = seq.object_groups
            assert [g.object_ids for g in groups] == [
                (oid,) for oid in sorted(info["entry_frames"])
            ]
            # mid-sequence objects get their own support frame
            assert [g.support_frame for g in groups] == [
                info["entry_frames"][oid]
                for oid in sorted(info["entry_frames"])
            ]
            img = idx.get_image(name, 0)
            assert img.shape[:2] == tuple(info["hw"])
            # the mid-sequence object is absent from earlier labels
            for oid, first in info["entry_frames"].items():
                if first > 0:
                    early = idx.get_label(name, first - 1)
                    assert oid not in np.unique(early)
                sup = idx.get_label(name, first)
                assert oid in np.unique(sup)
