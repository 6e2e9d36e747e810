"""Per-component timing of the Mask R-CNN per-frame inference step at 480p.

Times increasing prefixes of the eval pipeline (backbone → RPN → proposals →
box head → NMS → mask head → paste), scan-chained over frames with scalar
outputs (tunnel-safe). Differences between stages give per-component cost.

Run: nohup python scripts/bench_detection.py > /tmp/bench_det.log 2>&1 &
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

from e_osvos_tpu.models.mask_rcnn import ROI_SCALES, MaskRCNN, paste_mask
from e_osvos_tpu.models.rpn import (
    augment_proposals_with_targets,
    generate_anchors,
    select_proposals,
)
from e_osvos_tpu.ops.boxes import clip_boxes, decode_boxes, masks_to_boxes
from e_osvos_tpu.ops.nms import batched_nms
from e_osvos_tpu.ops.roi_align import multiscale_roi_align

H, W = 480, 864
T = 10  # frames per timed call
REPS = 4

STAGES = [
    "backbone",      # backbone + FPN + RPN head
    "proposals",     # + select_proposals (top-k, decode, fast-NMS)
    "box_head",      # + proposal aug + box roi_align + box head
    "postprocess",   # + decode + NMS + top-K detections
    "mask_head",     # + mask roi_align + mask head
    "full",          # + paste + masks_to_boxes carry
]


def stage_fn(mdl, images, prev_boxes, prev_valid, key, stage: str):
    h, w = images.shape[1], images.shape[2]
    cfg = mdl.roi
    pyramid = mdl._features(images)
    logits, deltas = mdl.rpn_head(pyramid)
    if stage == "backbone":
        return sum(jnp.sum(l) for l in logits) + sum(jnp.sum(d) for d in deltas)

    anchors = [jnp.asarray(a) for a in generate_anchors((h, w), mdl.rpn)]
    proposals = select_proposals(mdl.rpn, anchors, logits, deltas, (h, w))
    if stage == "proposals":
        return jnp.sum(proposals.boxes) + jnp.sum(proposals.scores)

    b = images.shape[0]
    proposals = jax.vmap(
        lambda k, p, tb, tv: augment_proposals_with_targets(
            k, p, tb, tv, "EXTEND"
        )
    )(jax.random.split(key, b), proposals, prev_boxes, prev_valid)
    feats = [pyramid[i][0] for i in range(4)]
    p_boxes = proposals.boxes[0]
    box_feats = multiscale_roi_align(
        feats, p_boxes, (cfg.box_roi_size, cfg.box_roi_size), ROI_SCALES
    )
    cls_logits, box_deltas = mdl.box_head(box_feats)
    if stage == "box_head":
        return jnp.sum(cls_logits) + jnp.sum(box_deltas)

    probs = jax.nn.softmax(cls_logits, axis=-1)
    n, c = probs.shape
    boxes_pc = jax.vmap(
        lambda d, bx: decode_boxes(d, jnp.broadcast_to(bx, d.shape)),
        in_axes=(0, 0),
    )(box_deltas[:, 1:], p_boxes)
    boxes_f = clip_boxes(boxes_pc.reshape(-1, 4), (h, w))
    scores_f = probs[:, 1:].reshape(-1)
    classes_f = jnp.broadcast_to(jnp.arange(1, c)[None], (n, c - 1)).reshape(-1)
    valid_f = (
        jnp.broadcast_to(proposals.valid[0][:, None], (n, c - 1)).reshape(-1)
        & (scores_f > cfg.score_thresh)
    )
    idx, keep = batched_nms(
        boxes_f, scores_f, classes_f, cfg.nms_thresh,
        cfg.detections_per_img, valid=valid_f,
    )
    safe = jnp.maximum(idx, 0)
    det_boxes = jnp.where(keep[:, None], boxes_f[safe], 0.0)
    det_classes = jnp.where(keep, classes_f[safe], 0)
    if stage == "postprocess":
        return jnp.sum(det_boxes)

    m_feats = multiscale_roi_align(
        feats, det_boxes, (cfg.mask_roi_size, cfg.mask_roi_size), ROI_SCALES
    )
    m_logits = mdl.mask_head(m_feats)
    sel = jax.vmap(lambda ml, cl: ml[..., cl])(m_logits, det_classes)
    if stage == "mask_head":
        return jnp.sum(sel)

    m_probs = jax.nn.sigmoid(sel)
    pasted = jax.vmap(lambda mm, bb: paste_mask(mm, bb, (h, w)))(
        m_probs, det_boxes
    )
    pasted = pasted * keep[:, None, None]
    fg = jnp.max(pasted, axis=0)
    nb, nv = masks_to_boxes((fg >= 0.5).astype(jnp.float32)[None])
    return jnp.sum(fg) + jnp.sum(nb) + jnp.sum(nv)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    model = MaskRCNN(arch="resnet50", backbone_norm="group",
                     dtype=jnp.bfloat16)
    img = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        img, jnp.zeros((1, 1, H, W)), jnp.ones((1, 1), bool), train=True,
    )
    K = model.roi.detections_per_img
    prev_boxes = jnp.tile(jnp.asarray([[100.0, 100.0, 300.0, 300.0]]), (1, K, 1))
    prev_valid = jnp.ones((1, K), bool)

    frames = jnp.asarray(
        np.random.RandomState(0).rand(T, 1, H, W, 3), jnp.float32
    )

    prev = 0.0
    for stage in STAGES:
        def run(frames, stage=stage):
            def step(carry, fr):
                k = carry
                k, ks = jax.random.split(k)
                s = model.apply(
                    variables, fr, prev_boxes, prev_valid, ks, stage,
                    method=stage_fn,
                )
                return k, s

            _, ss = jax.lax.scan(step, jax.random.PRNGKey(0), frames)
            return jnp.sum(ss)

        f = jax.jit(run)
        out = f(frames)
        np.asarray(out)
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(f(frames))
            best = min(best, time.perf_counter() - t0)
        ms = best * 1e3 / T
        print(f"{stage:12s} {ms:8.2f} ms/frame  (+{ms - prev:6.2f})", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
