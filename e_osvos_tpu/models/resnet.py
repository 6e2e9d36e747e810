"""Dilated ResNet-50/101 backbone in Flax, NHWC (TPU-native layout).

Capability parity with the reference's torchvision backbones:
  - dilated variant (``replace_stride_with_dilation=[False, True, True]`` →
    output stride 8) used by DeepLabV3/V3+:
    /root/reference/src/networks/deeplabv3plus.py:113-142
  - strided variant (output stride 32) with C2..C5 feature taps feeding the
    FPN of Mask R-CNN: /root/reference/src/networks/mask_rcnn.py:431
  - BatchNorm → GroupNorm swap (reference does post-hoc module surgery,
    deeplabv3plus.py:180-191, mask_rcnn.py:523-534; here norm choice is a
    first-class constructor argument — no surgery needed)
  - frozen-BatchNorm mode: the reference default freezes BN stats and
    affine params (cfgs/meta.yaml parent_model.batch_norm.*); our
    ``norm='frozen_bn'`` folds the frozen statistics into a per-channel
    scale+bias, which XLA fuses into the preceding conv.

TPU-first design notes:
  * NHWC everywhere — the layout XLA:TPU convs natively tile to the MXU.
  * ``dtype`` controls activation/compute dtype (bfloat16 on TPU);
    parameters stay float32.
  * No in-place anything; plain functional modules so ``jax.checkpoint``
    can be applied per-stage by callers for BPTT memory control.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

Norm = Callable[..., nn.Module]


class FrozenScaleBias(nn.Module):
    """Per-channel affine y = x*scale + bias with non-trainable constants.

    Stands in for a BatchNorm whose statistics and affine terms are frozen
    (the reference's default parent-model BN mode). Parameters live in the
    ``batch_stats``-like 'constants' collection so optimizers skip them.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        scale = self.variable("constants", "scale", lambda: jnp.ones((c,), jnp.float32))
        bias = self.variable("constants", "bias", lambda: jnp.zeros((c,), jnp.float32))
        return x * scale.value.astype(self.dtype) + bias.value.astype(self.dtype)


def make_norm(norm: str, dtype: Any) -> Norm:
    # group variants use the lane-friendly TPU kernel (ops/group_norm.py):
    # parameter-compatible with nn.GroupNorm, ~3x less layout churn at
    # backbone activation shapes
    from e_osvos_tpu.ops.group_norm import FusedGroupNorm

    if norm == "group":
        # 32 groups matches the reference's GroupNorm swap for the backbone
        # (mask_rcnn.py:523-534 uses 32; deeplab decoder uses 16 — the
        # decoder passes its own factory).
        return partial(FusedGroupNorm, num_groups=32, dtype=dtype)
    if norm == "group16":
        return partial(FusedGroupNorm, num_groups=16, dtype=dtype)
    if norm == "group4":
        # for the miniature test arch whose widths aren't divisible by 32
        return partial(FusedGroupNorm, num_groups=4, dtype=dtype)
    if norm.endswith("_xla") and norm[:-4] in ("group", "group16", "group4"):
        # pure-XLA GroupNorm (no Pallas kernel): required when the model is
        # differentiated beyond one reverse-mode level — i.e. meta-training
        # with second_order_gradients (the Pallas custom_vjp has no JVP rule)
        groups = {"group": 32, "group16": 16, "group4": 4}[norm[:-4]]
        return partial(FusedGroupNorm, num_groups=groups, dtype=dtype,
                       use_pallas=False)
    if norm == "frozen_bn":
        return partial(FrozenScaleBias, dtype=dtype)
    if norm == "batch":
        return partial(
            nn.BatchNorm, use_running_average=True, momentum=0.9, dtype=dtype
        )
    raise ValueError(f"unknown norm {norm!r}")


class Bottleneck(nn.Module):
    """Standard ResNet bottleneck: 1x1 reduce → 3x3 (stride/dilation) → 1x1
    expand (4x), with projection shortcut on shape change."""

    filters: int
    strides: int = 1
    dilation: int = 1
    norm: Norm = nn.GroupNorm
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        out_ch = self.filters * 4

        residual = x
        y = conv(self.filters, (1, 1), name="conv1")(x)
        y = self.norm(name="norm1")(y)
        y = nn.relu(y)
        y = conv(
            self.filters,
            (3, 3),
            strides=(self.strides, self.strides),
            kernel_dilation=(self.dilation, self.dilation),
            padding=[(self.dilation, self.dilation)] * 2,
            name="conv2",
        )(y)
        y = self.norm(name="norm2")(y)
        y = nn.relu(y)
        y = conv(out_ch, (1, 1), name="conv3")(y)
        y = self.norm(name="norm3")(y)

        if residual.shape[-1] != out_ch or self.strides != 1:
            residual = conv(
                out_ch, (1, 1), strides=(self.strides, self.strides), name="down_conv"
            )(x)
            residual = self.norm(name="down_norm")(residual)

        return nn.relu(y + residual)


STAGE_SIZES = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    # 1-block-per-stage miniature for fast CPU tests and tiny fixtures
    "resnet10": (1, 1, 1, 1),
}

# per-arch stage widths; resnet10 shrinks channels 8x so full grad compiles
# stay fast on the CPU test mesh
STAGE_FILTERS = {
    "resnet50": (64, 128, 256, 512),
    "resnet101": (64, 128, 256, 512),
    "resnet10": (8, 16, 32, 64),
}

STEM_WIDTH = {"resnet50": 64, "resnet101": 64, "resnet10": 8}


class ResNet(nn.Module):
    """ResNet-50/101 trunk returning the C2..C5 feature pyramid.

    ``dilate_stages``: per-stage (layer2, layer3, layer4) flags replacing
    stride with dilation — ``(False, True, True)`` reproduces the reference's
    output-stride-8 DeepLab trunk (deeplabv3plus.py:113-115); all-False is
    the stride-32 detection trunk for FPN.
    """

    arch: str = "resnet50"
    norm_layer: str = "group"
    dilate_stages: Tuple[bool, bool, bool] = (False, False, False)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> dict[str, Array]:
        norm = make_norm(self.norm_layer, self.dtype)
        sizes = STAGE_SIZES[self.arch]
        x = x.astype(self.dtype)

        x = nn.Conv(
            STEM_WIDTH[self.arch],
            (7, 7),
            strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            use_bias=False,
            dtype=self.dtype,
            name="stem_conv",
        )(x)
        x = norm(name="stem_norm")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        feats = {}
        dilation = 1
        stage_filters = STAGE_FILTERS[self.arch]
        for stage_idx, (blocks, filters) in enumerate(zip(sizes, stage_filters)):
            if stage_idx == 0:
                stride = 1
                stage_dilation = 1
            else:
                dilate = self.dilate_stages[stage_idx - 1]
                if dilate:
                    dilation *= 2
                    stride = 1
                else:
                    stride = 2
                stage_dilation = dilation
            for b in range(blocks):
                x = Bottleneck(
                    filters=filters,
                    strides=stride if b == 0 else 1,
                    # torchvision semantics: when dilating, the first block of
                    # the stage uses the *previous* dilation for its 3x3.
                    dilation=stage_dilation // 2
                    if (b == 0 and stage_dilation > 1)
                    else stage_dilation,
                    norm=norm,
                    dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_block{b}",
                )(x)
            feats[f"C{stage_idx + 2}"] = x
        return feats
