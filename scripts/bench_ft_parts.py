"""Breakdown of one Mask R-CNN fine-tune step at 480p batch 3.

Stages: augmentation only → train forward → full grad → sgd step.
Scan-chained with scalar outputs (tunnel-safe).

Run: nohup python scripts/bench_ft_parts.py > /tmp/bench_ft_parts.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from e_osvos_tpu.data import transforms
from e_osvos_tpu.models.mask_rcnn import MaskRCNN

H, W = 480, 864
B = 3
ITERS = 5
REPS = 3


def main():
    print(f"devices: {jax.devices()}", flush=True)
    model = MaskRCNN(arch="resnet50", backbone_norm="group", dtype=jnp.bfloat16)
    img1 = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        img1, jnp.zeros((1, 1, H, W)), jnp.ones((1, 1), bool), train=True,
    )
    rs = np.random.RandomState(0)
    frame = jnp.asarray(rs.rand(H, W, 3) * 255, jnp.float32)
    label = jnp.zeros((H, W), jnp.int32).at[100:300, 200:500].set(1)

    def prep(key):
        k_aug, k_sample = jax.random.split(key)
        imgs, labels = transforms.augment_support_batch(
            k_aug, frame, label, B, None
        )
        imgs = transforms.normalize(imgs, "davis")
        masks = jnp.where(labels == 255, 255.0, labels.astype(jnp.float32))
        return imgs, masks[:, None], jnp.any(masks[:, None] == 1, axis=(2, 3)), k_sample

    def loss_from(imgs, gt_masks, gt_valid, k_sample, params):
        total, _ = model.apply(
            params, imgs, gt_masks, gt_valid, train=True,
            rngs={"sample": k_sample},
        )
        return total

    def stage_aug(key, params):
        imgs, m, v, _ = prep(key)
        return jnp.sum(imgs) + jnp.sum(m)

    def stage_fwd(key, params):
        imgs, m, v, ks = prep(key)
        return loss_from(imgs, m, v, ks, params)

    def stage_grad(key, params):
        imgs, m, v, ks = prep(key)
        loss, grads = jax.value_and_grad(
            lambda p: loss_from(imgs, m, v, ks, p)
        )(params)
        return loss + sum(jnp.sum(jnp.abs(g).astype(jnp.float32)) * 0
                          for g in jax.tree_util.tree_leaves(grads)) + sum(
            jnp.max(jnp.abs(g)).astype(jnp.float32)
            for g in jax.tree_util.tree_leaves(grads)
        )

    def stage_jitter(key, params):
        k_aug, _ = jax.random.split(key)
        keys = jax.random.split(k_aug, B)
        out = jax.vmap(
            lambda k: transforms.color_jitter(k, frame, None
                                              or transforms.AugmentConfig())
        )(keys)
        return jnp.sum(out)

    def stage_assign(key, params):
        from e_osvos_tpu.models.rpn import assign_rpn_targets, generate_anchors
        from e_osvos_tpu.ops.boxes import masks_to_boxes

        imgs, m, v, ks = prep(key)
        anchors = jnp.concatenate(
            [jnp.asarray(a) for a in generate_anchors((H, W), model.rpn)]
        )
        def per_image(k, masks, mvalid):
            gt_boxes, box_ok = masks_to_boxes(masks)
            tgt = assign_rpn_targets(model.rpn, anchors, gt_boxes,
                                     mvalid & box_ok, k)
            return (jnp.sum(tgt.labels) + jnp.sum(tgt.matched_boxes)
                    + jnp.sum(tgt.sample_mask))
        outs = jax.vmap(per_image)(jax.random.split(ks, B), m, v)
        return jnp.sum(outs) + jnp.sum(imgs)

    for name, fn in [("jitter", stage_jitter), ("aug", stage_aug),
                     ("assign", stage_assign), ("fwd", stage_fwd),
                     ("grad", stage_grad)]:
        def run(key):
            def step(k, _):
                k, ks = jax.random.split(k)
                return k, fn(ks, variables)

            _, outs = jax.lax.scan(step, key, None, length=ITERS)
            return jnp.sum(outs)

        f = jax.jit(run)
        key = jax.random.PRNGKey(3)
        np.asarray(f(key))
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(f(key))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:6s} {best * 1e3 / ITERS:8.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
