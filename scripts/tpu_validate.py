"""On-TPU validation: Pallas NMS kernel vs XLA oracle (incl. under vmap),
and a Mask R-CNN eval forward. Run manually / by CI on real hardware:

    python scripts/tpu_validate.py

The test suite covers everything on the CPU mesh; this script covers the
TPU-only code path (ops/pallas_nms.py compiled by Mosaic, and the
batched_nms dispatch inside the detection model)."""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def check_pallas_nms():
    from e_osvos_tpu.ops.nms import nms as nms_xla
    from e_osvos_tpu.ops.pallas_nms import nms_pallas

    key = jax.random.PRNGKey(0)
    xy = jax.random.uniform(key, (300, 2)) * 100
    wh = jax.random.uniform(jax.random.fold_in(key, 1), (300, 2)) * 40 + 2
    boxes = jnp.concatenate([xy, xy + wh], -1)
    scores = jax.random.uniform(jax.random.fold_in(key, 2), (300,))

    ref_i, ref_k = jax.device_get(nms_xla(boxes, scores, 0.5, 64))
    out_i, out_k = jax.device_get(nms_pallas(boxes, scores, 0.5, 64))
    assert (ref_k == out_k).all(), "keep mask mismatch"
    assert (ref_i == out_i).all(), "index mismatch"
    print("pallas nms: OK (matches XLA oracle on TPU)")

    # under vmap (the model's per-image path)
    vb = jnp.stack([boxes, boxes + 5.0])
    vs = jnp.stack([scores, scores])
    vi, vk = jax.device_get(
        jax.vmap(lambda b, s: nms_pallas(b, s, 0.5, 16))(vb, vs)
    )
    ri, rk = jax.device_get(
        jax.vmap(lambda b, s: nms_xla(b, s, 0.5, 16))(vb, vs)
    )
    assert (vk == rk).all() and (vi == ri).all(), "vmap mismatch"
    print("pallas nms under vmap: OK")


def check_mask_rcnn_forward():
    from e_osvos_tpu.models import MaskRCNN, RoIConfig, RPNConfig

    model = MaskRCNN(
        arch="resnet50",
        dtype=jnp.bfloat16,
        rpn=RPNConfig(pre_nms_top_n=512, post_nms_top_n=256),
        roi=RoIConfig(detections_per_img=1),
    )
    x = jnp.zeros((1, 480, 864, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x
    )
    det = model.apply(variables, x, rngs={"sample": jax.random.PRNGKey(2)})
    det = jax.device_get(det)
    assert det.masks.shape == (1, 1, 480, 864)
    assert np.isfinite(det.scores).all()
    print("mask r-cnn 480p eval forward: OK")


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices())
    check_pallas_nms()
    check_mask_rcnn_forward()
    print("ALL TPU CHECKS PASSED")
