"""Box utilities for the detection path (pure jnp, static shapes).

Behavioral parity targets in the reference (no code copied):
  - box IoU / area: torchvision box_ops used by
    /root/reference/src/networks/mask_rcnn.py (RPN matching, NMS)
  - box encode/decode: torchvision BoxCoder (R-CNN delta parameterization)
  - mask → tight box target synthesis: mask_rcnn.py:582-714 (np.where over
    binary masks)
  - eval-time ±10% box jitter for RPN proposal augmentation:
    mask_rcnn.py:251-332

TPU-first: everything operates on fixed-size padded box arrays with a
``valid`` mask; invalid boxes are zeros and are excluded via masking, never
by filtering (no dynamic shapes).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

# standard R-CNN bbox regression weights (dx, dy, dw, dh)
BBOX_REG_WEIGHTS = (1.0, 1.0, 1.0, 1.0)
# cap on exp() growth in decode, log(1000/16)
BBOX_XFORM_CLIP = 4.135166556742356


def box_area(boxes: Array) -> Array:
    """[N,4] xyxy → [N] areas (0 for degenerate boxes)."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def box_iou(a: Array, b: Array) -> Array:
    """Pairwise IoU: a [N,4], b [M,4] xyxy → [N,M]."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)


def clip_boxes(boxes: Array, size: Tuple[int, int]) -> Array:
    """Clip xyxy boxes to [0,W]x[0,H]. size = (H, W)."""
    h, w = size
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def encode_boxes(reference: Array, proposals: Array,
                 weights=BBOX_REG_WEIGHTS) -> Array:
    """R-CNN regression targets: deltas taking ``proposals`` to
    ``reference`` (GT) boxes. Both [N,4] xyxy → [N,4] (dx,dy,dw,dh)."""
    wx, wy, ww, wh = weights
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = jnp.maximum(proposals[..., 2] - proposals[..., 0], 1e-6)
    ph = jnp.maximum(proposals[..., 3] - proposals[..., 1], 1e-6)
    gx = (reference[..., 0] + reference[..., 2]) * 0.5
    gy = (reference[..., 1] + reference[..., 3]) * 0.5
    gw = jnp.maximum(reference[..., 2] - reference[..., 0], 1e-6)
    gh = jnp.maximum(reference[..., 3] - reference[..., 1], 1e-6)
    return jnp.stack(
        [
            wx * (gx - px) / pw,
            wy * (gy - py) / ph,
            ww * jnp.log(gw / pw),
            wh * jnp.log(gh / ph),
        ],
        axis=-1,
    )


def decode_boxes(deltas: Array, boxes: Array,
                 weights=BBOX_REG_WEIGHTS) -> Array:
    """Apply regression deltas [N,4] to boxes [N,4] xyxy → [N,4] xyxy."""
    wx, wy, ww, wh = weights
    px = (boxes[..., 0] + boxes[..., 2]) * 0.5
    py = (boxes[..., 1] + boxes[..., 3]) * 0.5
    pw = jnp.maximum(boxes[..., 2] - boxes[..., 0], 1e-6)
    ph = jnp.maximum(boxes[..., 3] - boxes[..., 1], 1e-6)
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.clip(deltas[..., 2] / ww, max=BBOX_XFORM_CLIP)
    dh = jnp.clip(deltas[..., 3] / wh, max=BBOX_XFORM_CLIP)
    cx = dx * pw + px
    cy = dy * ph + py
    w = jnp.exp(dw) * pw
    h = jnp.exp(dh) * ph
    return jnp.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def masks_to_boxes(masks: Array) -> Tuple[Array, Array]:
    """Tight xyxy boxes from binary masks [N,H,W] → ([N,4], valid [N]).

    Parity: the reference's target synthesis computes np.where over each
    object's binary mask (mask_rcnn.py:582-714); here arg-reductions over
    static shapes (empty masks → valid=False, zero box)."""
    n, h, w = masks.shape
    m = masks > 0
    any_row = jnp.any(m, axis=2)  # [N,H]
    any_col = jnp.any(m, axis=1)  # [N,W]
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    big = jnp.iinfo(jnp.int32).max
    y1 = jnp.min(jnp.where(any_row, ys[None, :], big), axis=1)
    y2 = jnp.max(jnp.where(any_row, ys[None, :], -1), axis=1)
    x1 = jnp.min(jnp.where(any_col, xs[None, :], big), axis=1)
    x2 = jnp.max(jnp.where(any_col, xs[None, :], -1), axis=1)
    valid = jnp.any(any_row, axis=1)
    boxes = jnp.stack(
        [x1, y1, x2 + 1, y2 + 1], axis=-1
    ).astype(jnp.float32)
    boxes = jnp.where(valid[:, None], boxes, 0.0)
    return boxes, valid


def jitter_boxes(key: Array, boxes: Array, rel: float = 0.1) -> Array:
    """±rel relative jitter of box coordinates (eval-time RPN proposal
    augmentation, mask_rcnn.py:251-332: previous-frame target boxes are
    jittered by 10% of width/height)."""
    w = (boxes[..., 2] - boxes[..., 0])[..., None]
    h = (boxes[..., 3] - boxes[..., 1])[..., None]
    scale = jnp.concatenate([w, h, w, h], axis=-1)
    noise = jax.random.uniform(key, boxes.shape, minval=-rel, maxval=rel)
    return boxes + noise * scale


def remove_small_boxes_mask(boxes: Array, min_size: float) -> Array:
    """Validity mask for boxes with both sides ≥ min_size (torchvision
    remove_small_boxes as a mask, mask_rcnn.py:388)."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return (w >= min_size) & (h >= min_size)
