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


def check_pallas_group_norm():
    """Mosaic-compiled GN (fwd + custom VJP) vs flax at a large-spatial
    shape (the hybrid dispatch uses the Pallas path above 16384 rows)."""
    from flax import linen as nn

    from e_osvos_tpu.ops.pallas_group_norm import pallas_group_norm

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 120, 216, 256),
                          jnp.float32)
    s = jax.random.normal(jax.random.PRNGKey(1), (256,)) + 1.0
    b = jax.random.normal(jax.random.PRNGKey(2), (256,))

    def ref(x, s, b):
        return nn.GroupNorm(num_groups=32).apply(
            {"params": {"scale": s, "bias": b}}, x)

    got = jax.device_get(jax.jit(
        lambda x, s, b: pallas_group_norm(x, s, b, 32))(x, s, b))
    want = jax.device_get(jax.jit(ref)(x, s, b))
    err = np.abs(got - want).max()
    assert err < 1e-3, f"pallas GN fwd mismatch: {err}"

    g1 = jax.device_get(jax.jit(jax.grad(
        lambda x, s, b: jnp.sum(jnp.sin(pallas_group_norm(x, s, b, 32))),
        argnums=(0, 1, 2)))(x, s, b))
    g2 = jax.device_get(jax.jit(jax.grad(
        lambda x, s, b: jnp.sum(jnp.sin(ref(x, s, b))),
        argnums=(0, 1, 2)))(x, s, b))
    for a, c in zip(g1, g2):
        # parameter grads sum ~50k f32 terms in different orders: compare
        # with a relative tolerance scaled to the gradient magnitude
        scale = np.abs(c).max() + 1.0
        err = np.abs(a - c).max() / scale
        assert err < 1e-3, f"pallas GN grad mismatch: rel {err}"
    print("pallas group norm (Mosaic fwd + VJP): OK")


def check_packed_warp():
    """Packed corner-stack warp vs the generic gather warp on TPU."""
    from e_osvos_tpu.data import transforms

    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.randint(0, 256, (480, 864, 3)), jnp.float32)
    label = jnp.asarray(rs.randint(0, 2, (480, 864)), jnp.int32)
    theta, s = 0.4, 1.15
    matrix = jnp.array(
        [[np.cos(theta) / s, np.sin(theta) / s, 3.0],
         [-np.sin(theta) / s, np.cos(theta) / s, -2.0]], jnp.float32)
    gi, gl, _ = jax.device_get(jax.jit(
        lambda i, l: transforms.affine_warp_packed(i, l, matrix, jnp.float32)
    )(img, label))
    wi, wl = jax.device_get(jax.jit(
        lambda i, l: transforms.affine_warp(i, l, matrix, 0.0, 255.0)
    )(img, label))
    assert np.abs(gi - wi).max() < 1e-2, "packed warp image mismatch"
    assert (gl == wl).mean() > 0.999, "packed warp label mismatch"
    print("packed affine warp: OK")


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices())
    check_pallas_nms()
    check_pallas_group_norm()
    check_packed_warp()
    check_mask_rcnn_forward()
    print("ALL TPU CHECKS PASSED")
