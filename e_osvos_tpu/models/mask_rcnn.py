"""Mask R-CNN for one-shot VOS, rebuilt static-shape for TPU (Flax, NHWC).

Capability parity with the reference's torchvision-based MaskRCNN
(/root/reference/src/networks/mask_rcnn.py:425-775):
  * ResNet-50/101 FPN backbone (mask_rcnn.py:431), GroupNorm(32) swap
    (mask_rcnn.py:523-534 — here a constructor arg, no module surgery);
  * RPN with proposal selection and the eval-time proposal augmentation
    tracking prior (mask_rcnn.py:251-332) — see models/rpn.py;
  * box head (MultiScaleRoIAlign 7x7 → 2 FC → cls + box deltas) and mask
    head (14x14 → 4 convs → deconv → 28x28 per-class logits), torchvision
    architecture recreated in Flax;
  * target synthesis from binary/ID masks inside forward: unique ids →
    binary masks → tight boxes (mask_rcnn.py:582-714), here via
    ops.boxes.masks_to_boxes on padded [O,H,W] mask stacks;
  * training returns (Σ losses, loss dict) over objectness / rpn-box /
    classifier / box-reg / mask (mask_rcnn.py:727-731); mask loss BCE or
    Lovász hinge with 255-ignore (mask_rcnn.py:86-92);
  * eval returns per-detection mask probabilities pasted to image
    resolution + boxes as dense fixed-size tensors (mask_rcnn.py:753-775),
    with score-threshold + NMS + top-``detections_per_img`` postprocess
    (mask_rcnn.py:347-420; detections_per_img=1 in single_id VOS mode,
    evaluate.py:106-107).

TPU-first: everything fixed-shape (padded GT objects, padded proposals,
fixed detection budget); "filtering" is masking; NMS/ROI-align are the
static kernels in ops/. Dynamic shapes never cross a jit boundary.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from e_osvos_tpu.models.fpn import FPN
from e_osvos_tpu.models.resnet import ResNet
from e_osvos_tpu.models.rpn import (
    Proposals,
    RPNConfig,
    RPNHead,
    assign_rpn_targets,
    augment_proposals_with_targets,
    generate_anchors,
    rpn_losses,
    select_proposals,
)
from e_osvos_tpu.ops import losses as loss_ops
from e_osvos_tpu.ops.boxes import (
    box_iou,
    clip_boxes,
    decode_boxes,
    encode_boxes,
    masks_to_boxes,
)
from e_osvos_tpu.ops.nms import batched_nms
from e_osvos_tpu.ops.roi_align import (
    multiscale_roi_align,
    multiscale_roi_align_packed,
    roi_align,
    stack_roi_align_u8,
)

Array = jax.Array

# FPN level spatial scales for P2..P5 (ROI heads never see P6)
ROI_SCALES = (1 / 4, 1 / 8, 1 / 16, 1 / 32)


@dataclasses.dataclass(frozen=True)
class RoIConfig:
    num_classes: int = 2  # background + object (VOS is class-agnostic)
    box_roi_size: int = 7  # parent_model.roi_pool_output_sizes.box
    mask_roi_size: int = 14
    mask_out_size: int = 28  # parent_model.roi_pool_output_sizes.mask
    fg_iou_thresh: float = 0.5
    bg_iou_thresh: float = 0.5
    batch_size_per_image: int = 256
    positive_fraction: float = 0.25
    score_thresh: float = 0.05
    nms_thresh: float = 0.5  # parent_model.box_nms_thresh
    detections_per_img: int = 4
    mask_loss: str = "lovasz"  # parent_model.maskrcnn_loss ∈ {BCE, LOVASZ}


class BoxHead(nn.Module):
    """7x7x256 ROI features → 2x FC-1024 → (cls logits, per-class deltas)."""

    num_classes: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array]:
        n = x.shape[0]
        x = x.reshape(n, -1).astype(self.dtype)
        x = nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc6")(x))
        x = nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc7")(x))
        cls = nn.Dense(self.num_classes, dtype=self.dtype, name="cls_score")(x)
        reg = nn.Dense(self.num_classes * 4, dtype=self.dtype, name="bbox_pred")(x)
        return cls.astype(jnp.float32), reg.astype(jnp.float32).reshape(
            n, self.num_classes, 4
        )


class MaskHead(nn.Module):
    """14x14x256 ROI features → 4 convs → 2x deconv → per-class 28x28 logits."""

    num_classes: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = x.astype(self.dtype)
        for i in range(4):
            x = nn.relu(
                nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"mask_fcn{i + 1}")(x)
            )
        x = nn.relu(
            nn.ConvTranspose(256, (2, 2), strides=(2, 2), dtype=self.dtype,
                             name="deconv")(x)
        )
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    name="mask_logits")(x)
        return x.astype(jnp.float32)


class Detections(NamedTuple):
    boxes: Array  # [B, K, 4]
    scores: Array  # [B, K]
    classes: Array  # [B, K] int32
    masks: Array  # [B, K, H, W] probabilities pasted to image size
    valid: Array  # [B, K] bool


def paste_mask(mask: Array, box: Array, image_hw: Tuple[int, int]) -> Array:
    """Bilinear paste of a [m,m] mask into ``box`` on an [H,W] canvas
    (torchvision paste_masks_in_image semantics, as one inverse gather)."""
    h, w = image_hw
    m = mask.shape[0]
    x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
    bw = jnp.maximum(x2 - x1, 1e-3)
    bh = jnp.maximum(y2 - y1, 1e-3)
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5 - y1) / bh * m - 0.5
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5 - x1) / bw * m - 0.5
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    def g(yi, xi):
        ok = (yi[:, None] >= 0) & (yi[:, None] < m) & (xi[None, :] >= 0) & (xi[None, :] < m)
        v = mask[jnp.clip(yi, 0, m - 1)][:, jnp.clip(xi, 0, m - 1)]
        return jnp.where(ok, v, 0.0)

    return (
        g(y0, x0) * (1 - wy) * (1 - wx)
        + g(y0, x0 + 1) * (1 - wy) * wx
        + g(y0 + 1, x0) * wy * (1 - wx)
        + g(y0 + 1, x0 + 1) * wy * wx
    )


def _sample_fixed(mask: Array, count: int, key: Array) -> Tuple[Array, Array]:
    """Indices of a random fixed-size subset of ``mask`` (with repeats of
    eligible slots if fewer than ``count``; validity flags returned)."""
    n = mask.shape[0]
    r = jax.random.uniform(key, (n,))
    score = jnp.where(mask, r, 2.0)
    order = jnp.argsort(score)  # eligible first, random within
    avail = jnp.sum(mask)
    idx = order[jnp.arange(count) % jnp.maximum(n, 1)]
    take = jnp.arange(count) < avail
    # wrap within available region to repeat eligible slots
    wrapped = order[jnp.arange(count) % jnp.maximum(avail, 1)]
    idx = jnp.where(take, idx, wrapped)
    return idx.astype(jnp.int32), take | (avail > 0)


class MaskRCNN(nn.Module):
    """Full detector. Call signatures (``train`` is static):

    training:  ``model.apply(vars, images, gt_masks, gt_valid, train=True,
               rngs={'sample': key})`` → (total_loss, loss_dict)
    inference: ``model.apply(vars, images, prev_boxes=..., prev_valid=...,
               proposal_aug_mode='EXTEND', rngs={'sample': key})`` →
               Detections

    images [B,H,W,3] normalized; gt_masks [B,O,H,W] binary {0,1} with 255
    ignore allowed; gt_valid [B,O].
    """

    arch: str = "resnet50"
    backbone_norm: str = "group"
    dtype: Any = jnp.float32
    rpn: RPNConfig = RPNConfig()
    roi: RoIConfig = RoIConfig()

    def setup(self):
        self.backbone = ResNet(
            arch=self.arch,
            norm_layer=self.backbone_norm,
            dilate_stages=(False, False, False),
            dtype=self.dtype,
            name="backbone",
        )
        self.fpn = FPN(out_ch=256, dtype=self.dtype, name="fpn")
        self.rpn_head = RPNHead(
            num_anchors=len(self.rpn.aspect_ratios), dtype=self.dtype,
            name="rpn_head",
        )
        self.box_head = BoxHead(
            num_classes=self.roi.num_classes, dtype=self.dtype, name="box_head"
        )
        self.mask_head = MaskHead(
            num_classes=self.roi.num_classes, dtype=self.dtype, name="mask_head"
        )

    def _features(self, images: Array) -> Sequence[Array]:
        feats = self.backbone(images)
        return self.fpn(feats)  # [P2..P6]

    def __call__(
        self,
        images: Array,
        gt_masks: Optional[Array] = None,
        gt_valid: Optional[Array] = None,
        train: bool = False,
        prev_boxes: Optional[Array] = None,
        prev_valid: Optional[Array] = None,
        proposal_aug_mode: Optional[str] = None,
        box_coord_perm: Optional[Array] = None,
    ):
        b, h, w = images.shape[0], images.shape[1], images.shape[2]
        pyramid = self._features(images)
        logits, deltas = self.rpn_head(pyramid)
        anchors = [jnp.asarray(a) for a in generate_anchors((h, w), self.rpn)]
        proposals = select_proposals(
            self.rpn,
            anchors,
            [jax.lax.stop_gradient(l) for l in logits],
            [jax.lax.stop_gradient(d) for d in deltas],
            (h, w),
        )
        roi_feats = [pyramid[i] for i in range(4)]  # P2..P5

        if train:
            key = self.make_rng("sample")
            return self._forward_train(
                key, (h, w), anchors, logits, deltas, proposals, roi_feats,
                gt_masks, gt_valid, box_coord_perm,
            )
        if proposal_aug_mode and prev_boxes is not None:
            key = self.make_rng("sample")
            proposals = jax.vmap(
                lambda k, p, tb, tv: augment_proposals_with_targets(
                    k, p, tb, tv, proposal_aug_mode
                )
            )(jax.random.split(key, b), proposals, prev_boxes, prev_valid)
        return self._forward_eval((h, w), proposals, roi_feats)

    # ---- training --------------------------------------------------------

    def _forward_train(
        self, key, image_hw, anchors, rpn_logits, rpn_deltas, proposals,
        roi_feats, gt_masks, gt_valid, box_coord_perm=None,
    ):
        cfg = self.roi
        b = gt_masks.shape[0]
        all_anchors = jnp.concatenate(anchors)  # [N,4]
        rpn_logits_c = jnp.concatenate(rpn_logits, axis=1)  # [B,N]
        rpn_deltas_c = jnp.concatenate(rpn_deltas, axis=1)  # [B,N,4]

        keys = jax.random.split(key, b * 3).reshape(b, 3, -1)

        def per_image(ki, p_boxes, p_valid, masks, mvalid, lg, dl, *roi_feats_i):
            roi_feats_i = list(roi_feats_i)
            k_rpn, k_box, k_msk = ki[0], ki[1], ki[2]
            gt_boxes, box_ok = masks_to_boxes(masks)
            gt_ok = mvalid & box_ok

            # RPN losses
            tgt = assign_rpn_targets(self.rpn, all_anchors, gt_boxes, gt_ok, k_rpn)
            obj_l, rpnbox_l = rpn_losses(self.rpn, all_anchors, lg, dl, tgt)

            # append GT boxes to the proposal set (torchvision behavior)
            boxes = jnp.concatenate([p_boxes, gt_boxes], axis=0)
            valid = jnp.concatenate([p_valid, gt_ok], axis=0)

            # box-head matching
            iou = box_iou(boxes, gt_boxes)
            iou = jnp.where(gt_ok[None, :], iou, -1.0)
            best_gt = jnp.argmax(iou, axis=1)
            best_iou = jnp.max(iou, axis=1)
            is_fg = (best_iou >= cfg.fg_iou_thresh) & valid
            is_bg = (best_iou < cfg.bg_iou_thresh) & valid

            num_pos = int(cfg.batch_size_per_image * cfg.positive_fraction)
            pos_idx, pos_ok = _sample_fixed(is_fg, num_pos, k_box)
            neg_idx, neg_ok = _sample_fixed(
                is_bg, cfg.batch_size_per_image - num_pos, k_msk
            )
            pos_ok = pos_ok & is_fg[pos_idx]
            neg_ok = neg_ok & is_bg[neg_idx]
            samp_idx = jnp.concatenate([pos_idx, neg_idx])
            samp_ok = jnp.concatenate([pos_ok, neg_ok])
            samp_boxes = boxes[samp_idx]
            samp_gt = best_gt[samp_idx]
            samp_label = jnp.where(
                jnp.arange(samp_idx.shape[0]) < num_pos, 1, 0
            ) * samp_ok.astype(jnp.int32)

            box_feats = multiscale_roi_align_packed(
                roi_feats_i, samp_boxes, (cfg.box_roi_size, cfg.box_roi_size),
                ROI_SCALES,
            )
            cls_logits, box_deltas = self.box_head(box_feats)

            # classification loss (softmax CE over sampled rois)
            logp = jax.nn.log_softmax(cls_logits, axis=-1)
            cls_l = -jnp.sum(
                jnp.take_along_axis(logp, samp_label[:, None], axis=1)[:, 0]
                * samp_ok
            ) / jnp.maximum(jnp.sum(samp_ok), 1.0)

            # box regression on positives, class-1 deltas
            matched_boxes = gt_boxes[samp_gt]
            reg_t = encode_boxes(matched_boxes, samp_boxes)
            if box_coord_perm is not None:
                # per-task coordinate permutation of the regression targets
                # (the reference's random_box_coord_perm task randomization,
                # meta_tasksets.py:148-153)
                reg_t = reg_t[:, box_coord_perm]
            pred_d = box_deltas[:, 1]
            diff = jnp.abs(pred_d - reg_t)
            beta = 1.0 / 9.0
            sl1 = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
            posm = (samp_label == 1) & samp_ok
            breg_l = jnp.sum(jnp.sum(sl1, -1) * posm) / jnp.maximum(
                jnp.sum(samp_ok), 1.0
            )

            # mask head on the positive samples
            m_boxes = samp_boxes[:num_pos]
            m_ok = posm[:num_pos]
            m_gt = samp_gt[:num_pos]
            m_feats = multiscale_roi_align_packed(
                roi_feats_i, m_boxes, (cfg.mask_roi_size, cfg.mask_roi_size),
                ROI_SCALES,
            )
            m_logits = self.mask_head(m_feats)[..., 1]  # class-1 channel
            # GT mask crops (torchvision project_masks_on_boxes): gather
            # straight from the [O,H,W] mask stack — no per-roi full-res
            # materialization, all four bilinear corners byte-packed into one
            # u32 gather per sample (GT targets need no gradient)
            crops = stack_roi_align_u8(
                masks, m_boxes, m_gt, (cfg.mask_out_size, cfg.mask_out_size)
            )
            ignore = crops > 200.0  # 255-ignore propagated through pooling
            tgt_bin = (crops >= 0.5) & ~ignore
            valid_px = (~ignore) & m_ok[:, None, None]
            if cfg.mask_loss.lower() == "lovasz":
                mask_l = loss_ops.lovasz_hinge(
                    m_logits, tgt_bin.astype(jnp.float32), valid=valid_px,
                    per_image=True,
                )
            else:
                mask_l = loss_ops.cross_entropy_loss(
                    m_logits, tgt_bin.astype(jnp.float32), valid=valid_px
                )
            return obj_l, rpnbox_l, cls_l, breg_l, mask_l

        losses = jax.vmap(per_image)(
            keys,
            proposals.boxes,
            proposals.valid,
            gt_masks,
            gt_valid,
            rpn_logits_c,
            rpn_deltas_c,
            *roi_feats,
        )
        names = ["loss_objectness", "loss_rpn_box_reg", "loss_classifier",
                 "loss_box_reg", "loss_mask"]
        loss_dict = {n: jnp.mean(l) for n, l in zip(names, losses)}
        total = sum(loss_dict.values())
        return total, loss_dict

    # ---- inference -------------------------------------------------------

    def _forward_eval(self, image_hw, proposals: Proposals, roi_feats):
        cfg = self.roi
        h, w = image_hw

        def per_image(p_boxes, p_valid, *feats):
            feats = list(feats)
            # flat (unpacked) form: at eval's ROI counts the packed buffer
            # build costs more than the gathers it saves (flat 6.27 vs
            # packed 6.97 ms/frame measured at 512+4 rois, bench_roi_pack)
            box_feats = multiscale_roi_align(
                feats, p_boxes, (cfg.box_roi_size, cfg.box_roi_size), ROI_SCALES
            )
            cls_logits, box_deltas = self.box_head(box_feats)
            probs = jax.nn.softmax(cls_logits, axis=-1)  # [P,C]

            # decode class-1..C-1 boxes; flatten (roi, class) pairs
            n, c = probs.shape
            fg_classes = c - 1
            boxes_pc = jax.vmap(
                lambda d, bx: decode_boxes(d, jnp.broadcast_to(bx, d.shape)),
                in_axes=(0, 0),
            )(box_deltas[:, 1:], p_boxes)  # [P,C-1,4]
            boxes_f = clip_boxes(boxes_pc.reshape(-1, 4), (h, w))
            scores_f = probs[:, 1:].reshape(-1)
            classes_f = jnp.broadcast_to(
                jnp.arange(1, c)[None, :], (n, fg_classes)
            ).reshape(-1)
            valid_f = (
                jnp.broadcast_to(p_valid[:, None], (n, fg_classes)).reshape(-1)
                & (scores_f > cfg.score_thresh)
            )
            idx, keep = batched_nms(
                boxes_f, scores_f, classes_f, cfg.nms_thresh,
                cfg.detections_per_img, valid=valid_f,
            )
            safe = jnp.maximum(idx, 0)
            det_boxes = jnp.where(keep[:, None], boxes_f[safe], 0.0)
            det_scores = jnp.where(keep, scores_f[safe], 0.0)
            det_classes = jnp.where(keep, classes_f[safe], 0)

            m_feats = multiscale_roi_align(
                feats, det_boxes, (cfg.mask_roi_size, cfg.mask_roi_size),
                ROI_SCALES,
            )
            m_logits = self.mask_head(m_feats)  # [K,2m,2m,C]
            sel = jax.vmap(lambda ml, cl: ml[..., cl])(m_logits, det_classes)
            m_probs = jax.nn.sigmoid(sel)
            pasted = jax.vmap(lambda mm, bb: paste_mask(mm, bb, (h, w)))(
                m_probs, det_boxes
            )
            pasted = pasted * keep[:, None, None]
            return det_boxes, det_scores, det_classes, pasted, keep

        outs = jax.vmap(per_image)(
            proposals.boxes, proposals.valid, *roi_feats
        )
        return Detections(
            boxes=outs[0], scores=outs[1], classes=outs[2], masks=outs[3],
            valid=outs[4],
        )
