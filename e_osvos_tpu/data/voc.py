"""PASCAL VOC-2012 segmentation indexer (parent pre-training data).

Reference: /root/reference/src/data/pascal_voc.py:1-283 — VOC is used only
to pre-train the parent network on binary fg/bg segmentation. This indexer
exposes VOC through the same interface as the VOS indexers (sequences /
get_image / get_label), treating every image as a 1-frame "sequence" so the
parent FrameSampler and the one-shot fixtures work unchanged. VOC class
labels collapse to binary: any object class → 1, background → 0, void (255)
stays 255."""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from e_osvos_tpu.data.datasets import (
    ObjectGroup,
    VOSSequence,
    load_image,
    load_label,
)


class VOC2012Index:
    """Layout: VOCdevkit/VOC2012/{JPEGImages,SegmentationClass,
    ImageSets/Segmentation/<split>.txt}."""

    def __init__(self, root: str, split: str = "train"):
        base = root
        if os.path.isdir(os.path.join(root, "VOCdevkit", "VOC2012")):
            base = os.path.join(root, "VOCdevkit", "VOC2012")
        self.base = base
        split_file = os.path.join(
            base, "ImageSets", "Segmentation", f"{split}.txt"
        )
        with open(split_file) as f:
            names = [ln.strip() for ln in f if ln.strip()]
        self.sequences: Dict[str, VOSSequence] = {}
        for name in names:
            img = os.path.join(base, "JPEGImages", f"{name}.jpg")
            lab = os.path.join(base, "SegmentationClass", f"{name}.png")
            if not (os.path.exists(img) and os.path.exists(lab)):
                continue
            self.sequences[name] = VOSSequence(
                name=name,
                image_paths=[img],
                label_paths=[lab],
                object_groups=[ObjectGroup(object_ids=(1,), support_frame=0)],
                num_objects=1,
            )

    def get_image(self, seq: str, idx: int) -> np.ndarray:
        return load_image(self.sequences[seq].image_paths[idx])

    def get_label(self, seq: str, idx: int) -> Optional[np.ndarray]:
        raw = load_label(self.sequences[seq].label_paths[idx])
        # collapse the 20 VOC classes to binary fg/bg, keep 255 void
        out = np.where(raw == 255, np.uint8(255), (raw > 0).astype(np.uint8))
        return out
