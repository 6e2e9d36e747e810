"""Second-order meta-gradients at 480p: memory/compile validation on TPU.

The reference's second-order mode keeps the inner-grad graph only for
roi_heads (mask_rcnn.py:513,536-544 + meta_optim.py:185-204); its default
config is first-order (cfgs/meta.yaml:40). This validates BOTH our
second-order paths at real shapes on one chip:

  1. DeepLabV3+ with full second-order through a 5-step 480^2 inner loop;
  2. Mask R-CNN with second_order_subtrees=(box_head, mask_head) — the
     reference's roi_heads restriction — through a 3-step 480p inner loop.

Run: nohup python scripts/validate_second_order.py > /tmp/val_so.log 2>&1 &
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def report_mem(tag):
    try:
        stats = jax.local_devices()[0].memory_stats()
        peak = stats.get("peak_bytes_in_use", 0) / 2**30
        print(f"  [{tag}] peak HBM: {peak:.2f} GiB", flush=True)
    except Exception as e:  # tunnel backends may not expose stats
        print(f"  [{tag}] memory_stats unavailable: {e}", flush=True)


def check_deeplab_second_order():
    from e_osvos_tpu.data import transforms
    from e_osvos_tpu.meta_optim import (
        MetaOptimConfig, init_meta_params, meta_grads,
    )
    from e_osvos_tpu.models import DeepLabV3Plus
    from e_osvos_tpu.ops import losses as loss_ops

    H = W = 480
    model = DeepLabV3Plus(num_classes=1, arch="resnet50",
                          backbone_norm="frozen_bn", output_stride=16,
                          dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, H, W, 3), jnp.float32))
    cfg = MetaOptimConfig(lr_hierarchy_level="neuron", init_lr=1e-3,
                          learn_model_init=True, use_log_init_lr=False,
                          second_order_gradients=True)
    mp = init_meta_params(cfg, params)

    def loss_fn(p, batch):
        key, img, label = batch
        imgs, labels = transforms.augment_support_batch(
            key, img, label, 3, transforms.AugmentConfig())
        imgs = transforms.normalize(imgs, "davis")
        valid = labels != 255
        gts = jnp.where(valid, labels, 0).astype(jnp.float32)
        logits = model.apply(p, imgs)[..., 0]
        return loss_ops.compute_loss("dice", logits, gts, valid)

    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(H, W, 3) * 255, jnp.float32)
    label = jnp.zeros((H, W), jnp.int32).at[100:300, 100:300].set(1)
    steps = 5
    keys = jax.random.split(jax.random.PRNGKey(1), steps)
    batches = (keys,
               jnp.broadcast_to(img, (steps,) + img.shape),
               jnp.broadcast_to(label, (steps,) + label.shape))
    meta_batch = (jax.random.PRNGKey(2), img, label)

    f = jax.jit(lambda mp: meta_grads(
        cfg, loss_fn, loss_fn, mp, batches, meta_batch, bptt_epochs=5))
    t0 = time.perf_counter()
    loss, grads, _ = f(mp)
    loss = float(loss)
    lr_leaves = jax.tree_util.tree_leaves(grads.log_init_lr)
    gnorm = float(sum(jnp.sum(jnp.abs(g.astype(jnp.float32)))
                      for g in lr_leaves))
    print(f"deeplab second-order 480^2 x5 steps: loss={loss:.4f} "
          f"lr-grad L1={gnorm:.3e} ({time.perf_counter() - t0:.0f}s incl "
          "compile)", flush=True)
    assert np.isfinite(loss) and gnorm > 0
    report_mem("deeplab-2nd-order")


def check_mask_rcnn_second_order():
    from e_osvos_tpu.meta_optim import (
        MetaOptimConfig, init_meta_params, meta_grads,
    )
    from e_osvos_tpu.models import MaskRCNN
    from e_osvos_tpu.parallel.meta_step import MetaStepConfig, detection_task_fns

    H, W = 480, 864
    # group_xla: second-order differentiates THROUGH the inner backward, and
    # the Pallas GN custom_vjp supports only one reverse-mode level
    model = MaskRCNN(arch="resnet50", backbone_norm="group_xla",
                     dtype=jnp.bfloat16)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, H, W, 3), jnp.float32), jnp.zeros((1, 1, H, W)),
        jnp.ones((1, 1), bool), train=True)
    cfg = MetaOptimConfig(
        lr_hierarchy_level="neuron", init_lr=1e-4, learn_model_init=True,
        use_log_init_lr=False, second_order_gradients=True,
        second_order_subtrees=("box_head", "mask_head"),
    )
    mp = init_meta_params(cfg, variables)
    step_cfg = MetaStepConfig(num_epochs=3, bptt_epochs=3, train_batch_size=2)
    train_loss_fn, query_loss_fn = detection_task_fns(model, step_cfg)

    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(H, W, 3) * 255, jnp.float32)
    label = jnp.zeros((H, W), jnp.int32).at[100:300, 200:500].set(1)
    steps = 3
    keys = jax.random.split(jax.random.PRNGKey(1), steps)
    perm = jnp.arange(4, dtype=jnp.int32)
    batches = (keys,
               jnp.broadcast_to(img, (steps,) + img.shape),
               jnp.broadcast_to(label, (steps,) + label.shape),
               jnp.broadcast_to(perm, (steps, 4)))
    meta_batch = (jax.random.PRNGKey(2), img[None], label[None], perm)

    f = jax.jit(lambda mp: meta_grads(
        cfg, train_loss_fn, query_loss_fn, mp, batches, meta_batch,
        bptt_epochs=3))
    t0 = time.perf_counter()
    loss, grads, _ = f(mp)
    loss = float(loss)
    lr_leaves = jax.tree_util.tree_leaves(grads.log_init_lr)
    gnorm = float(sum(jnp.sum(jnp.abs(g.astype(jnp.float32)))
                      for g in lr_leaves))
    print(f"mask r-cnn second-order (roi-heads subtree) 480p x3 steps: "
          f"loss={loss:.4f} lr-grad L1={gnorm:.3e} "
          f"({time.perf_counter() - t0:.0f}s incl compile)", flush=True)
    assert np.isfinite(loss) and gnorm > 0
    report_mem("maskrcnn-2nd-order")


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    check_deeplab_second_order()
    check_mask_rcnn_second_order()
    print("SECOND-ORDER VALIDATION PASSED", flush=True)
