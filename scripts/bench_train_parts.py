"""Stage timing of the Mask R-CNN TRAIN forward at 480p batch 3 (the
fine-tune step's forward). Mirrors _forward_train piecewise.

Run: nohup python scripts/bench_train_parts.py > /tmp/bench_train_parts.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
import numpy as np

from e_osvos_tpu.models.mask_rcnn import ROI_SCALES, MaskRCNN, _sample_fixed
from e_osvos_tpu.models.rpn import (
    assign_rpn_targets,
    generate_anchors,
    rpn_losses,
    select_proposals,
)
from e_osvos_tpu.ops import losses as loss_ops
from e_osvos_tpu.ops.boxes import box_iou, encode_boxes, masks_to_boxes
from e_osvos_tpu.ops.roi_align import (
    multiscale_roi_align_packed,
    stack_roi_align_u8,
)

H, W, B = 480, 864, 3
ITERS = 5
REPS = 3

STAGES = ["backbone", "proposals", "rpn_loss", "box_stage", "mask_align",
          "mask_head", "mask_crops", "full"]


def stage_fn(mdl, images, gt_masks, gt_valid, key, stage: str):
    h, w = images.shape[1], images.shape[2]
    cfg = mdl.roi
    pyramid = mdl._features(images)
    logits, deltas = mdl.rpn_head(pyramid)
    if stage == "backbone":
        return sum(jnp.sum(l) for l in logits) + sum(jnp.sum(d) for d in deltas)

    anchors = [jnp.asarray(a) for a in generate_anchors((h, w), mdl.rpn)]
    proposals = select_proposals(
        mdl.rpn, anchors,
        [jax.lax.stop_gradient(l) for l in logits],
        [jax.lax.stop_gradient(d) for d in deltas], (h, w),
    )
    if stage == "proposals":
        return jnp.sum(proposals.boxes)

    b = gt_masks.shape[0]
    all_anchors = jnp.concatenate(anchors)
    logits_c = jnp.concatenate(logits, axis=1)
    deltas_c = jnp.concatenate(deltas, axis=1)
    keys = jax.random.split(key, b * 3).reshape(b, 3, -1)

    def per_image(ki, p_boxes, p_valid, masks, mvalid, lg, dl, *feats):
        feats = list(feats)
        gt_boxes, box_ok = masks_to_boxes(masks)
        gt_ok = mvalid & box_ok
        tgt = assign_rpn_targets(mdl.rpn, all_anchors, gt_boxes, gt_ok, ki[0])
        obj_l, rpnbox_l = rpn_losses(mdl.rpn, all_anchors, lg, dl, tgt)
        if stage == "rpn_loss":
            return obj_l + rpnbox_l

        boxes = jnp.concatenate([p_boxes, gt_boxes], axis=0)
        valid = jnp.concatenate([p_valid, gt_ok], axis=0)
        iou = box_iou(boxes, gt_boxes)
        iou = jnp.where(gt_ok[None, :], iou, -1.0)
        best_gt = jnp.argmax(iou, axis=1)
        best_iou = jnp.max(iou, axis=1)
        is_fg = (best_iou >= cfg.fg_iou_thresh) & valid
        is_bg = (best_iou < cfg.bg_iou_thresh) & valid
        num_pos = int(cfg.batch_size_per_image * cfg.positive_fraction)
        pos_idx, pos_ok = _sample_fixed(is_fg, num_pos, ki[1])
        neg_idx, neg_ok = _sample_fixed(
            is_bg, cfg.batch_size_per_image - num_pos, ki[2])
        pos_ok = pos_ok & is_fg[pos_idx]
        neg_ok = neg_ok & is_bg[neg_idx]
        samp_idx = jnp.concatenate([pos_idx, neg_idx])
        samp_ok = jnp.concatenate([pos_ok, neg_ok])
        samp_boxes = boxes[samp_idx]
        samp_gt = best_gt[samp_idx]
        samp_label = jnp.where(jnp.arange(samp_idx.shape[0]) < num_pos, 1, 0
                               ) * samp_ok.astype(jnp.int32)
        box_feats = multiscale_roi_align_packed(
            feats, samp_boxes, (cfg.box_roi_size, cfg.box_roi_size), ROI_SCALES)
        cls_logits, box_deltas = mdl.box_head(box_feats)
        logp = jax.nn.log_softmax(cls_logits, axis=-1)
        cls_l = -jnp.sum(
            jnp.take_along_axis(logp, samp_label[:, None], axis=1)[:, 0]
            * samp_ok) / jnp.maximum(jnp.sum(samp_ok), 1.0)
        matched_boxes = gt_boxes[samp_gt]
        reg_t = encode_boxes(matched_boxes, samp_boxes)
        diff = jnp.abs(box_deltas[:, 1] - reg_t)
        beta = 1.0 / 9.0
        sl1 = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
        posm = (samp_label == 1) & samp_ok
        breg_l = jnp.sum(jnp.sum(sl1, -1) * posm) / jnp.maximum(
            jnp.sum(samp_ok), 1.0)
        if stage == "box_stage":
            return cls_l + breg_l

        m_boxes = samp_boxes[:num_pos]
        m_ok = posm[:num_pos]
        m_gt = samp_gt[:num_pos]
        m_feats = multiscale_roi_align_packed(
            feats, m_boxes, (cfg.mask_roi_size, cfg.mask_roi_size), ROI_SCALES)
        if stage == "mask_align":
            return cls_l + breg_l + jnp.sum(m_feats.astype(jnp.float32))
        m_logits = mdl.mask_head(m_feats)[..., 1]
        if stage == "mask_head":
            return cls_l + breg_l + jnp.sum(m_logits)
        crops = stack_roi_align_u8(
            masks, m_boxes, m_gt, (cfg.mask_out_size, cfg.mask_out_size))
        if stage == "mask_crops":
            return cls_l + breg_l + jnp.sum(m_logits) + jnp.sum(crops)
        ignore = crops > 200.0
        tgt_bin = (crops >= 0.5) & ~ignore
        valid_px = (~ignore) & m_ok[:, None, None]
        mask_l = loss_ops.lovasz_hinge(
            m_logits, tgt_bin.astype(jnp.float32), valid=valid_px,
            per_image=True)
        return obj_l + rpnbox_l + cls_l + breg_l + mask_l

    roi_feats = [pyramid[i] for i in range(4)]
    outs = jax.vmap(per_image)(
        keys, proposals.boxes, proposals.valid, gt_masks, gt_valid,
        logits_c, deltas_c, *roi_feats)
    return jnp.sum(outs)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    model = MaskRCNN(arch="resnet50", backbone_norm="group", dtype=jnp.bfloat16)
    img1 = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        img1, jnp.zeros((1, 1, H, W)), jnp.ones((1, 1), bool), train=True)

    rs = np.random.RandomState(0)
    imgs = jnp.asarray(rs.rand(B, H, W, 3) * 255, jnp.float32)
    masks = jnp.zeros((B, 1, H, W), jnp.float32).at[:, :, 100:300, 200:500].set(1.0)
    valid = jnp.ones((B, 1), bool)

    prev = 0.0
    for stage in STAGES:
        def run(key, stage=stage):
            def step(k, _):
                k, ks = jax.random.split(k)
                s = model.apply(variables, imgs, masks, valid, ks, stage,
                                method=stage_fn)
                return k, s
            _, outs = jax.lax.scan(step, key, None, length=ITERS)
            return jnp.sum(outs)

        f = jax.jit(run)
        np.asarray(f(jax.random.PRNGKey(0)))
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(f(jax.random.PRNGKey(0)))
            best = min(best, time.perf_counter() - t0)
        ms = best * 1e3 / ITERS
        print(f"{stage:10s} {ms:8.2f} ms  (+{ms - prev:6.2f})", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
