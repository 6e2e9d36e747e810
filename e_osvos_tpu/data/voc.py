"""PASCAL VOC-2012 segmentation indexer (parent pre-training data).

Reference: /root/reference/src/data/pascal_voc.py:1-283 — VOC is used only
to pre-train the parent network on binary fg/bg segmentation. This indexer
exposes VOC through the same interface as the VOS indexers (sequences /
get_image / get_label), treating every image as a 1-frame "sequence" so the
parent FrameSampler and the one-shot fixtures work unchanged. VOC class
labels collapse to binary: any object class → 1, background → 0.

Void-255 handling (``void=``):
  * ``"background"`` (default): void → background, the reference's stated
    intent (pascal_voc.py:156 "make unlabelled to background"). NOTE the
    reference's actual pipeline has an ordering bug — ``Normalize`` divides
    the mask by 255 (pascal_voc.py:135) BEFORE ``ToTensor`` compares
    against 255 (pascal_voc.py:157), so upstream the void pixels slip
    through ``mask.ne(0.0)`` and train as FOREGROUND; this rebuild
    implements the documented intent, not the bug (see MIGRATING.md).
  * ``"ignore"``: keep 255 so the losses' valid-masks exclude void pixels
    — this framework's richer mode.

The reference's VOC transform stack (flip / RandomScaleCrop / GaussianBlur,
pascal_voc.py:86-96) maps to ``transforms.VOC_PARENT_AUGMENT`` (one fused
on-device affine + blur) with ``normalize(mode="unit")``; the val-protocol
``FixScaleCrop`` (pascal_voc.py:240-263) is ``fix_scale_crop`` below."""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

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

    def __init__(self, root: str, split: str = "train",
                 void: str = "background"):
        if void not in ("background", "ignore"):
            raise ValueError(f"void={void!r} not in ('background', 'ignore')")
        self.void = void
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
        # collapse the 20 VOC classes to binary fg/bg
        fg = ((raw > 0) & (raw != 255)).astype(np.uint8)
        if self.void == "ignore":
            return np.where(raw == 255, np.uint8(255), fg)
        return fg


def fix_scale_crop(
    img: np.ndarray, label: np.ndarray, crop_size: int
) -> Tuple[np.ndarray, np.ndarray]:
    """FixScaleCrop val protocol (pascal_voc.py:240-263): scale the SHORT
    edge to ``crop_size`` (bilinear image / nearest label), then center-crop
    ``crop_size`` square. Host-side numpy; output shape is static, so the
    downstream eval program compiles once for all VOC image sizes."""
    h, w = img.shape[:2]
    if w > h:
        oh, ow = crop_size, int(round(w * crop_size / h))
    else:
        ow, oh = crop_size, int(round(h * crop_size / w))
    ys = np.clip(((np.arange(oh) + 0.5) * h / oh - 0.5), 0, h - 1)
    xs = np.clip(((np.arange(ow) + 0.5) * w / ow - 0.5), 0, w - 1)
    y0i = np.floor(ys).astype(np.int64)
    x0i = np.floor(xs).astype(np.int64)
    y1i = np.minimum(y0i + 1, h - 1)
    x1i = np.minimum(x0i + 1, w - 1)
    wy = (ys - y0i)[:, None, None]
    wx = (xs - x0i)[None, :, None]
    im = img.astype(np.float32)
    out = (
        im[y0i][:, x0i] * (1 - wy) * (1 - wx)
        + im[y0i][:, x1i] * (1 - wy) * wx
        + im[y1i][:, x0i] * wy * (1 - wx)
        + im[y1i][:, x1i] * wy * wx
    )
    lab = label[np.round(ys).astype(np.int64)][:, np.round(xs).astype(np.int64)]
    y0 = int(round((oh - crop_size) / 2.0))
    x0 = int(round((ow - crop_size) / 2.0))
    out = out[y0 : y0 + crop_size, x0 : x0 + crop_size]
    lab = lab[y0 : y0 + crop_size, x0 : x0 + crop_size]
    return out.astype(img.dtype), lab
