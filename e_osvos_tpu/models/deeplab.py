"""DeepLabV3 and DeepLabV3+ segmentation heads in Flax (NHWC).

Capability parity with the reference:
  - ASPP with atrous rates (6, 12, 18) + image-level pooling branch:
    /root/reference/src/networks/deeplabv3plus.py:15-30
  - V3+ decoder: 48-ch 1x1 on the low-level (C2) features, concat with the
    4x-upsampled ASPP output, two 3x3 convs, 1x1 classifier:
    deeplabv3plus.py:56-101
  - plain V3: ASPP → 3x3 conv → classifier on the C5 features:
    /root/reference/src/networks/deeplabv3.py:24-42
  - decoder norm selectable GroupNorm(16)/frozen-BN (deeplabv3plus.py:180-191)
  - forward returns logits bilinearly upsampled to the input resolution
    (deeplabv3plus.py:282-301); the reference returns a 1-element list, we
    return the array directly.
  - dropout-free training switch is the default here (the reference's
    ``train_without_dropout``, deeplabv3plus.py:259-280): fine-tuning through
    a learned optimizer wants deterministic forward passes, so dropout is
    only active when an rng is explicitly provided.

TPU-first notes: everything is static-shape NHWC; the bilinear upsample uses
``jax.image.resize`` (lowered to XLA gather/convs); compute dtype is
configurable bfloat16 with float32 params and float32 logits output.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from e_osvos_tpu.models.resnet import ResNet, make_norm

Array = jax.Array


def resize_bilinear(x: Array, size: Tuple[int, int]) -> Array:
    """Bilinear NHWC resize (align_corners=False semantics of jax.image)."""
    b, h, w, c = x.shape
    if (h, w) == tuple(size):
        return x
    return jax.image.resize(x, (b, size[0], size[1], c), method="bilinear")


def _interp_matrix_align_corners(n_in: int, n_out: int) -> jnp.ndarray:
    """[n_out, n_in] 1-D linear-interpolation matrix with align_corners=True
    sampling (out i reads in position i·(n_in−1)/(n_out−1))."""
    if n_in == 1:
        return jnp.ones((n_out, 1), jnp.float32)
    pos = np.arange(n_out, dtype=np.float64) * (n_in - 1) / max(n_out - 1, 1)
    lo = np.clip(np.floor(pos).astype(np.int64), 0, n_in - 1)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = (pos - lo).astype(np.float32)
    m = np.zeros((n_out, n_in), np.float32)
    np.add.at(m, (np.arange(n_out), lo), 1.0 - frac)
    np.add.at(m, (np.arange(n_out), hi), frac)
    return jnp.asarray(m)


def resize_bilinear_align_corners(x: Array, size: Tuple[int, int]) -> Array:
    """Bilinear NHWC resize with align_corners=True — the convention the
    reference decoder uses to upsample the ASPP output onto the low-level
    features (deeplabv3plus.py:91), kept for checkpoint-import numeric
    fidelity. Implemented as two small dense interpolation matmuls (trace-
    time constants), which tile the MXU instead of emitting gathers."""
    b, h, w, c = x.shape
    if (h, w) == tuple(size):
        return x
    mh = _interp_matrix_align_corners(h, size[0]).astype(x.dtype)
    mw = _interp_matrix_align_corners(w, size[1]).astype(x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("pw,bowc->bopc", mw, y)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling: 1x1 + three dilated 3x3 branches +
    global-average-pool branch, fused by a 1x1 projection."""

    out_ch: int = 256
    rates: Sequence[int] = (6, 12, 18)
    norm_layer: str = "group16"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        norm = make_norm(self.norm_layer, self.dtype)
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)

        branches = []
        y = conv(self.out_ch, (1, 1), name="b0_conv")(x)
        branches.append(nn.relu(norm(name="b0_norm")(y)))
        for i, r in enumerate(self.rates):
            y = conv(
                self.out_ch,
                (3, 3),
                kernel_dilation=(r, r),
                padding=[(r, r), (r, r)],
                name=f"b{i + 1}_conv",
            )(x)
            branches.append(nn.relu(norm(name=f"b{i + 1}_norm")(y)))

        # image-level pooling branch
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = conv(self.out_ch, (1, 1), name="pool_conv")(pooled)
        pooled = nn.relu(norm(name="pool_norm")(pooled))
        pooled = jnp.broadcast_to(
            pooled, (x.shape[0], x.shape[1], x.shape[2], self.out_ch)
        )
        branches.append(pooled)

        y = jnp.concatenate(branches, axis=-1)
        y = conv(self.out_ch, (1, 1), name="proj_conv")(y)
        y = nn.relu(norm(name="proj_norm")(y))
        return y


def _dilate_stages(output_stride: int):
    """8 → dilate layer3+layer4 (the reference's
    replace_stride_with_dilation=[False,True,True], deeplabv3plus.py:113-115);
    16 → dilate layer4 only (the DeepLab paper's standard training config,
    ~2x cheaper on TPU — the decoder recovers boundary detail)."""
    if output_stride == 8:
        return (False, True, True)
    if output_stride == 16:
        return (False, False, True)
    raise ValueError(f"output_stride must be 8 or 16, got {output_stride}")


class DeepLabV3(nn.Module):
    """ASPP head on a dilated ResNet trunk; logits at input resolution."""

    num_classes: int = 1
    arch: str = "resnet50"
    backbone_norm: str = "group"
    head_norm: str = "group16"
    output_stride: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        h, w = x.shape[1], x.shape[2]
        feats = ResNet(
            arch=self.arch,
            norm_layer=self.backbone_norm,
            dilate_stages=_dilate_stages(self.output_stride),
            dtype=self.dtype,
            name="backbone",
        )(x)
        y = ASPP(norm_layer=self.head_norm, dtype=self.dtype, name="aspp")(feats["C5"])
        norm = make_norm(self.head_norm, self.dtype)
        y = nn.Conv(256, (3, 3), use_bias=False, dtype=self.dtype, name="head_conv")(y)
        y = nn.relu(norm(name="head_norm")(y))
        y = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="classifier")(y)
        y = resize_bilinear(y.astype(jnp.float32), (h, w))
        return y


class DeepLabV3Plus(nn.Module):
    """ASPP + low-level-feature decoder; logits at input resolution."""

    num_classes: int = 1
    arch: str = "resnet50"
    backbone_norm: str = "group"
    head_norm: str = "group16"
    output_stride: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        h, w = x.shape[1], x.shape[2]
        feats = ResNet(
            arch=self.arch,
            norm_layer=self.backbone_norm,
            dilate_stages=_dilate_stages(self.output_stride),
            dtype=self.dtype,
            name="backbone",
        )(x)
        y = ASPP(norm_layer=self.head_norm, dtype=self.dtype, name="aspp")(feats["C5"])

        norm = make_norm(self.head_norm, self.dtype)
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)

        low = conv(48, (1, 1), name="low_conv")(feats["C2"])
        low = nn.relu(norm(name="low_norm")(low))

        # align_corners=True to match the reference decoder's interpolation
        # (deeplabv3plus.py:91) so imported parent checkpoints reproduce
        y = resize_bilinear_align_corners(y, (low.shape[1], low.shape[2]))
        y = jnp.concatenate([y, low.astype(y.dtype)], axis=-1)
        y = conv(256, (3, 3), padding="SAME", name="dec_conv1")(y)
        y = nn.relu(norm(name="dec_norm1")(y))
        y = conv(256, (3, 3), padding="SAME", name="dec_conv2")(y)
        y = nn.relu(norm(name="dec_norm2")(y))
        y = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="classifier")(y)
        y = resize_bilinear(y.astype(jnp.float32), (h, w))
        return y


ARCHITECTURES = {
    "DeepLabV3": DeepLabV3,
    "DeepLabV3Plus": DeepLabV3Plus,
}


def build_model(architecture: str, **kwargs):
    """Model factory. Parity: init_parent_model dispatch,
    /root/reference/src/util/helper_func.py:339-357 (Mask R-CNN is added to
    the registry by e_osvos_tpu.models.mask_rcnn at import time)."""
    if architecture not in ARCHITECTURES:
        raise ValueError(
            f"unknown architecture {architecture!r}; have {list(ARCHITECTURES)}"
        )
    return ARCHITECTURES[architecture](**kwargs)
