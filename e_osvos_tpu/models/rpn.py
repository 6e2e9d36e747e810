"""Region Proposal Network, static-shape TPU design.

Capability parity with the torchvision RPN the reference monkey-patches
(/root/reference/src/networks/mask_rcnn.py:217-332): anchor generation over
FPN levels, shared 3x3+1x1 head, top-k pre-NMS selection per level, decode +
clip + NMS to a fixed proposal budget, IoU-based anchor↔GT matching with
balanced sampling for the objectness/box losses, and the reference's
eval-time proposal augmentation (jittered previous-frame boxes EXTEND/REPLACE
the proposal set — how tracking context enters the detector).

TPU-first deviations: every stage is fixed-shape — "filtering" is masking,
NMS is the padded greedy kernel (ops/nms.py), proposal lists are padded to
``post_nms_top_n`` with a validity mask. No dynamic shapes anywhere.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from e_osvos_tpu.ops.boxes import (
    box_iou,
    clip_boxes,
    decode_boxes,
    encode_boxes,
    remove_small_boxes_mask,
)
from e_osvos_tpu.ops.nms import batched_nms, fast_nms

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class RPNConfig:
    anchor_sizes: Tuple[int, ...] = (32, 64, 128, 256, 512)
    aspect_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    pre_nms_top_n: int = 1000  # per level
    post_nms_top_n: int = 512
    nms_thresh: float = 0.7
    # one-pass Fast-NMS for proposal selection (ops/nms.py::fast_nms):
    # removes the max_out sequential greedy rounds from the per-frame path;
    # slightly more aggressive suppression, which RPN consumers tolerate —
    # set False for exact greedy (torchvision) semantics
    use_fast_nms: bool = True
    min_size: float = 1e-3
    fg_iou_thresh: float = 0.7
    bg_iou_thresh: float = 0.3
    batch_size_per_image: int = 256
    positive_fraction: float = 0.5


def generate_anchors(
    image_hw: Tuple[int, int], cfg: RPNConfig
) -> List[np.ndarray]:
    """Per-level anchor grids [H_l·W_l·A, 4] xyxy (host constants; become
    jit literals). One size per level × all ratios, centered on cell centers
    (torchvision AnchorGenerator semantics with cell-corner offsets)."""
    h, w = image_hw
    out = []
    for size, stride in zip(cfg.anchor_sizes, cfg.strides):
        gh = (h + stride - 1) // stride
        gw = (w + stride - 1) // stride
        base = []
        for r in cfg.aspect_ratios:
            ah = size * np.sqrt(r)
            aw = size / np.sqrt(r)
            base.append([-aw / 2, -ah / 2, aw / 2, ah / 2])
        base = np.asarray(base, np.float32)  # [A,4]
        ys = (np.arange(gh, dtype=np.float32)) * stride
        xs = (np.arange(gw, dtype=np.float32)) * stride
        cx, cy = np.meshgrid(xs, ys)
        shifts = np.stack([cx, cy, cx, cy], axis=-1).reshape(-1, 1, 4)
        anchors = (shifts + base[None]).reshape(-1, 4)
        out.append(anchors.astype(np.float32))
    return out


class RPNHead(nn.Module):
    """Shared conv head: 3x3 + ReLU → (objectness [A], deltas [4A])."""

    num_anchors: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> Tuple[List[Array], List[Array]]:
        conv = nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype, name="conv")
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype, name="cls_logits")
        reg = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype, name="bbox_pred")
        logits, deltas = [], []
        for f in feats:
            t = nn.relu(conv(f))
            b = f.shape[0]
            logits.append(cls(t).astype(jnp.float32).reshape(b, -1))
            deltas.append(reg(t).astype(jnp.float32).reshape(b, -1, 4))
        return logits, deltas


class Proposals(NamedTuple):
    boxes: Array  # [B, post_nms_top_n, 4]
    scores: Array  # [B, post_nms_top_n]
    valid: Array  # [B, post_nms_top_n] bool


def select_proposals(
    cfg: RPNConfig,
    anchors: Sequence[Array],
    logits: Sequence[Array],
    deltas: Sequence[Array],
    image_hw: Tuple[int, int],
) -> Proposals:
    """Top-k → decode → clip → level-aware NMS → fixed budget."""

    def per_image(logits_i, deltas_i):
        all_boxes, all_scores, all_levels, all_valid = [], [], [], []
        for lvl, (anc, lg, dl) in enumerate(zip(anchors, logits_i, deltas_i)):
            k = min(cfg.pre_nms_top_n, lg.shape[0])
            scores, idx = jax.lax.top_k(lg, k)
            boxes = decode_boxes(dl[idx], anc[idx])
            boxes = clip_boxes(boxes, image_hw)
            ok = remove_small_boxes_mask(boxes, cfg.min_size)
            all_boxes.append(boxes)
            all_scores.append(scores)
            all_levels.append(jnp.full((k,), lvl, jnp.int32))
            all_valid.append(ok)
        boxes = jnp.concatenate(all_boxes)
        scores = jnp.concatenate(all_scores)
        levels = jnp.concatenate(all_levels)
        valid = jnp.concatenate(all_valid)
        if cfg.use_fast_nms:
            idx, keep = fast_nms(
                boxes, jax.nn.sigmoid(scores), cfg.nms_thresh,
                cfg.post_nms_top_n, valid=valid, ids=levels,
            )
        else:
            idx, keep = batched_nms(
                boxes, jax.nn.sigmoid(scores), levels, cfg.nms_thresh,
                cfg.post_nms_top_n, valid=valid,
            )
        safe = jnp.maximum(idx, 0)
        return Proposals(
            boxes=jnp.where(keep[:, None], boxes[safe], 0.0),
            scores=jnp.where(keep, jax.nn.sigmoid(scores)[safe], 0.0),
            valid=keep,
        )

    # vmap over the batch: logits/deltas are lists of [B, N_l(,4)]
    return jax.vmap(
        lambda lgs, dls: per_image(lgs, dls)
    )(tuple(logits), tuple(deltas))


class RPNTargets(NamedTuple):
    labels: Array  # [N_anchors] 1 fg / 0 bg / -1 ignore
    matched_boxes: Array  # [N_anchors, 4] the assigned GT box
    sample_mask: Array  # [N_anchors] bool — in the sampled minibatch


def assign_rpn_targets(
    cfg: RPNConfig,
    anchors: Array,
    gt_boxes: Array,
    gt_valid: Array,
    key: Array,
) -> RPNTargets:
    """IoU matching + balanced sampling (torchvision Matcher +
    BalancedPositiveNegativeSampler semantics, fixed shapes).

    anchors [N,4]; gt_boxes [M,4] padded; gt_valid [M]."""
    n = anchors.shape[0]
    iou = box_iou(anchors, gt_boxes)  # [N,M]
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)

    labels = jnp.where(
        best_iou >= cfg.fg_iou_thresh,
        1,
        jnp.where(best_iou < cfg.bg_iou_thresh, 0, -1),
    )
    # low-quality matches: every GT's best anchor is positive
    any_gt = jnp.any(gt_valid)
    per_gt_best = jnp.max(jnp.where(gt_valid[None, :], iou, -1.0), axis=0)  # [M]
    is_best = jnp.any(
        (iou >= per_gt_best[None, :] - 1e-6) & gt_valid[None, :] & (iou > 0),
        axis=1,
    )
    labels = jnp.where(is_best & any_gt, 1, labels)
    matched_boxes = gt_boxes[best_gt]

    # balanced sampling: pick ≤ pos_count positives and fill with negatives.
    # top_k of the randomized scores instead of a full argsort — the anchor
    # set is ~107k at 480p and two 107k argsorts per image dominated the
    # target-assignment cost; k is the (small, static) sample budget.
    num_pos_max = int(cfg.batch_size_per_image * cfg.positive_fraction)
    kp, kn = jax.random.split(key)

    def sample(mask, count, max_count, k):
        """Random subset of ``mask`` of size min(count, |mask|) as a boolean
        mask; ``max_count`` is the static bound on ``count``."""
        r = jax.random.uniform(k, (n,))
        score = jnp.where(mask, r, -1.0)  # eligible first
        kk = min(max_count, n)
        vals, idx = jax.lax.top_k(score, kk)
        chosen = (vals >= 0.0) & (jnp.arange(kk) < count)
        return jnp.zeros((n,), bool).at[idx].set(chosen)

    pos_mask = sample(labels == 1, num_pos_max, num_pos_max, kp)
    num_neg = cfg.batch_size_per_image - jnp.sum(pos_mask)
    neg_mask = sample(labels == 0, num_neg, cfg.batch_size_per_image, kn)
    return RPNTargets(
        labels=labels,
        matched_boxes=matched_boxes,
        sample_mask=pos_mask | neg_mask,
    )


def rpn_losses(
    cfg: RPNConfig,
    anchors: Array,
    logits: Array,
    deltas: Array,
    targets: RPNTargets,
) -> Tuple[Array, Array]:
    """(objectness BCE, box smooth-L1) over the sampled anchors —
    torchvision compute_loss semantics (sum/N_sampled for boxes)."""
    labels = targets.labels
    sm = targets.sample_mask
    # objectness
    lab = jnp.clip(labels, 0, 1).astype(jnp.float32)
    per = jnp.maximum(logits, 0) - logits * lab + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    obj_loss = jnp.sum(per * sm) / jnp.maximum(jnp.sum(sm), 1.0)
    # box regression on positives only
    pos = sm & (labels == 1)
    reg_targets = encode_boxes(targets.matched_boxes, anchors)
    diff = deltas - reg_targets
    beta = 1.0 / 9.0
    ad = jnp.abs(diff)
    sl1 = jnp.where(ad < beta, 0.5 * ad * ad / beta, ad - 0.5 * beta)
    box_loss = jnp.sum(jnp.sum(sl1, -1) * pos) / jnp.maximum(jnp.sum(sm), 1.0)
    return obj_loss, box_loss


def augment_proposals_with_targets(
    key: Array,
    proposals: Proposals,
    target_boxes: Array,
    target_valid: Array,
    mode: str,
    jitter: float = 0.1,
) -> Proposals:
    """Eval-time tracking prior (mask_rcnn.py:251-332): jitter the
    previous-frame boxes ±10% and EXTEND (second half of the proposal budget
    becomes jittered target boxes) or REPLACE the proposal set."""
    from e_osvos_tpu.ops.boxes import jitter_boxes

    if mode is None or mode == "NONE":
        return proposals
    n = proposals.boxes.shape[-2]
    m = target_boxes.shape[-2]
    reps = (n + m - 1) // m
    tiled = jnp.tile(target_boxes, (reps, 1))[:n]
    tiled_valid = jnp.tile(target_valid, (reps,))[:n]
    jittered = jitter_boxes(key, tiled, jitter)
    if mode == "REPLACE":
        return Proposals(
            boxes=jittered,
            scores=jnp.where(tiled_valid, 1.0, 0.0),
            valid=tiled_valid,
        )
    if mode == "EXTEND":
        half = n // 2
        keep_first = jnp.arange(n) < half
        boxes = jnp.where(keep_first[:, None], proposals.boxes, jittered)
        valid = jnp.where(keep_first, proposals.valid, tiled_valid)
        scores = jnp.where(keep_first, proposals.scores,
                           jnp.where(tiled_valid, 1.0, 0.0))
        return Proposals(boxes=boxes, scores=scores, valid=valid)
    raise ValueError(f"unknown proposal augmentation mode {mode!r}")
