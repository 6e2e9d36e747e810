"""Padded fixed-shape non-maximum suppression (the TPU-native NMS).

The reference calls torchvision's CUDA ``nms`` / ``batched_nms``
(/root/reference/src/networks/mask_rcnn.py:392) which returns a
variable-length index list — a shape-dynamic op XLA cannot express. This
implementation is the padded/fixed-size design from SURVEY.md §7: greedy NMS
as ``max_out`` rounds of (argmax over masked scores → suppress overlaps),
entirely in vector ops so the whole thing compiles to one static program.
Invalid slots return index -1.

Memory design: the naive formulation materializes an N×N IoU matrix (90 MB
of HBM traffic for N≈4700 FPN proposals). Here each round computes the IoU
of the selected box against all boxes on the fly — O(N) VMEM-resident vector
work per round on the VPU, no quadratic buffer. A Pallas kernel with the box
tensor pinned in VMEM across rounds lives in ops/pallas_nms.py; this module
is the XLA fallback and the correctness oracle.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _iou_one_vs_all(box: Array, boxes: Array) -> Array:
    """IoU of one xyxy box [4] against [N,4]."""
    lt = jnp.maximum(box[:2], boxes[:, :2])
    rb = jnp.minimum(box[2:], boxes[:, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[:, 0] * wh[:, 1]
    area1 = jnp.maximum(box[2] - box[0], 0.0) * jnp.maximum(box[3] - box[1], 0.0)
    area2 = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0.0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0.0
    )
    union = area1 + area2 - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)


def nms(
    boxes: Array,
    scores: Array,
    iou_threshold: float,
    max_out: int,
    valid: Array | None = None,
) -> Tuple[Array, Array]:
    """Greedy NMS over [N,4] xyxy boxes.

    Returns (indices [max_out] int32 with -1 padding, keep_mask [max_out]).
    ``valid`` masks out padded input slots."""
    n = boxes.shape[0]
    alive = jnp.ones((n,), jnp.bool_) if valid is None else valid.astype(jnp.bool_)
    lane = jnp.arange(n)

    def body(i, state):
        alive, out_idx, out_ok = state
        masked = jnp.where(alive, scores, -jnp.inf)
        best = jnp.argmax(masked)
        ok = masked[best] > -jnp.inf
        best_box = boxes[best]
        iou = _iou_one_vs_all(best_box, boxes)
        suppress = iou > iou_threshold
        alive = alive & ~suppress & (lane != best)
        out_idx = out_idx.at[i].set(jnp.where(ok, best.astype(jnp.int32), -1))
        out_ok = out_ok.at[i].set(ok)
        return alive, out_idx, out_ok

    out_idx = jnp.full((max_out,), -1, jnp.int32)
    out_ok = jnp.zeros((max_out,), jnp.bool_)
    _, out_idx, out_ok = jax.lax.fori_loop(
        0, max_out, body, (alive, out_idx, out_ok)
    )
    return out_idx, out_ok


def fast_nms(
    boxes: Array,
    scores: Array,
    iou_threshold: float,
    max_out: int,
    valid: Array | None = None,
    ids: Array | None = None,
) -> Tuple[Array, Array]:
    """One-pass parallel NMS (YOLACT "Fast NMS" semantics): a box is
    suppressed if ANY higher-scoring box overlaps it above the threshold —
    computed as one upper-triangular IoU matrix reduction instead of
    ``max_out`` sequential greedy rounds. Slightly more aggressive than
    exact greedy NMS (a suppressed box can still suppress others), which is
    fine for RPN proposal selection where the consumer re-scores everything;
    use ``nms`` for final detections.

    Returns (indices [max_out] sorted by score, keep mask)."""
    from e_osvos_tpu.ops.boxes import box_iou

    n = boxes.shape[0]
    v = jnp.ones((n,), jnp.bool_) if valid is None else valid.astype(jnp.bool_)
    if ids is not None:
        max_coord = jnp.max(boxes) + 1.0
        boxes = boxes + ids.astype(boxes.dtype)[:, None] * max_coord
    # score order: higher-scoring first; ties broken by index
    s = jnp.where(v, scores, -jnp.inf)
    order = jnp.argsort(-s)
    b_sorted = boxes[order]
    v_sorted = v[order]
    iou = box_iou(b_sorted, b_sorted)
    tri = jnp.triu(jnp.ones((n, n), jnp.bool_), k=1)  # j suppressed by i<j
    suppressed = jnp.any(
        (iou > iou_threshold) & tri.T & v_sorted[None, :], axis=1
    )
    keep_sorted = v_sorted & ~suppressed
    # stable-select the first max_out kept entries (already score-sorted)
    rank = jnp.cumsum(keep_sorted) - 1
    take = keep_sorted & (rank < max_out)
    # scatter kept sorted-positions into the output slots (slot == max_out
    # means "not taken" and is dropped as out-of-bounds)
    out_idx = jnp.full((max_out,), -1, jnp.int32)
    slot = jnp.where(take, rank, max_out)
    out_idx = out_idx.at[slot].set(order.astype(jnp.int32), mode="drop")
    out_ok = jnp.arange(max_out) < jnp.sum(take)
    out_idx = jnp.where(out_ok, out_idx, -1)
    return out_idx, out_ok


def batched_nms(
    boxes: Array,
    scores: Array,
    ids: Array,
    iou_threshold: float,
    max_out: int,
    valid: Array | None = None,
) -> Tuple[Array, Array]:
    """Category/level-aware NMS via the coordinate-offset trick
    (torchvision batched_nms semantics): boxes of different ``ids`` never
    suppress each other."""
    if boxes.shape[0] == 0:
        return (
            jnp.full((max_out,), -1, jnp.int32),
            jnp.zeros((max_out,), jnp.bool_),
        )
    max_coord = jnp.max(boxes) + 1.0
    offsets = ids.astype(boxes.dtype)[:, None] * max_coord
    shifted = boxes + offsets
    if jax.default_backend() == "tpu":
        # VMEM-resident Pallas kernel on TPU (ops/pallas_nms.py); the XLA
        # path below is the fallback + correctness oracle
        from e_osvos_tpu.ops.pallas_nms import nms_pallas

        return nms_pallas(shifted, scores, iou_threshold, max_out, valid)
    return nms(shifted, scores, iou_threshold, max_out, valid)
