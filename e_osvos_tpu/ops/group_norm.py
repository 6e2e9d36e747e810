"""Lane-friendly GroupNorm for TPU.

The reference swaps BatchNorm → ``nn.GroupNorm(32)`` in the Mask R-CNN
backbone (/root/reference/src/networks/mask_rcnn.py:523-534) and uses
GroupNorm(16) in the DeepLab decoder (deeplabv3plus.py:180-191). Flax's
``nn.GroupNorm`` reshapes ``[..., C] → [..., G, C//G]`` and reduces over the
split channel axis — on TPU that reshape breaks the 128-lane channel tiling
and forces a relayout on every call, which microbenchmarks showed to be the
single largest cost in the GN-32 480p backbone forward.

This module computes the *same* statistics without ever reshaping the big
tensor:

  1. per-channel spatial sums ``s, sq : [N, C]`` — a plain spatial reduction
     that keeps C on the lane axis (one fused pass over the tensor);
  2. group combine on the tiny ``[N, C]`` tensor (``[N, G, C//G]`` sum) —
     negligible;
  3. per-channel ``scale/shift`` broadcast and one fused
     ``y = x * scale + shift`` (+ optional ReLU) pass.

Total traffic: 2 reads + 1 write of the activation — the memory lower bound
for an exact two-pass normalization. The backward pass (via autodiff) has
the same structure and stays lane-friendly for the same reason.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def group_norm(
    x: Array,
    scale: Array,
    bias: Array,
    num_groups: int,
    eps: float = 1e-6,  # flax nn.GroupNorm default (torch uses 1e-5)
    relu: bool = False,
) -> Array:
    """GroupNorm over ``[N, ..., C]`` with per-(sample, group) statistics.

    Numerically matches ``flax.linen.GroupNorm`` (f32 statistics); ``relu``
    folds the activation into the normalize pass.
    """
    n, c = x.shape[0], x.shape[-1]
    g = num_groups
    assert c % g == 0, f"channels {c} not divisible by groups {g}"
    spatial_axes = tuple(range(1, x.ndim - 1))
    m = math.prod(x.shape[1:-1]) * (c // g)  # elements per group

    xf = x.astype(jnp.float32)
    s = jnp.sum(xf, spatial_axes)  # [N, C]
    sq = jnp.sum(xf * xf, spatial_axes)  # [N, C]

    gs = jnp.sum(s.reshape(n, g, c // g), axis=-1)  # [N, G]
    gsq = jnp.sum(sq.reshape(n, g, c // g), axis=-1)
    mean = gs / m
    # clamp: E[x^2]-E[x]^2 can cancel slightly negative in f32 at 480p sums
    var = jnp.maximum(gsq / m - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)

    # expand group stats back to channels on the tiny tensor
    mean_c = jnp.repeat(mean, c // g, axis=-1)  # [N, C]
    rstd_c = jnp.repeat(rstd, c // g, axis=-1)
    a = rstd_c * scale.astype(jnp.float32)[None]  # [N, C]
    b = bias.astype(jnp.float32)[None] - mean_c * a

    bshape = (n,) + (1,) * (x.ndim - 2) + (c,)
    y = xf * a.reshape(bshape) + b.reshape(bshape)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


# Pallas stats kernels beat the XLA reduction only when the TOTAL row count
# (batch × spatial) is large enough to amortize the kernel dispatch, and
# need the channel axis to fill the 128-wide lanes. Measured in-situ
# (conv→GN→relu chain, scripts/bench_groupnorm.py, v5e, crossover table in
# PERF.md): wins at 77.8k rows (batch-3 C2, fwd 4.55 vs 5.12 ms/layer, bwd
# 5.97 vs 6.83), ties-to-loses at 19.4k (batch-3 C3) and 25.9k (batch-1 C2
# — per-sample rows alone misdispatch this one), loses below. 65536 splits
# the measured win from every measured loss.
_PALLAS_MIN_TOTAL_ROWS = 65536
_PALLAS_MIN_CHANNELS = 128


def _use_pallas(x: Array) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    m = math.prod(x.shape[:-1])
    return m >= _PALLAS_MIN_TOTAL_ROWS and x.shape[-1] >= _PALLAS_MIN_CHANNELS


class FusedGroupNorm(nn.Module):
    """Drop-in for ``nn.GroupNorm``: Pallas fused-stats kernel at large
    spatial shapes, lane-friendly XLA formulation otherwise.

    Parameter names/shapes (``scale``/``bias`` of shape ``[C]``) match
    ``nn.GroupNorm`` so checkpoints interoperate.
    """

    num_groups: int = 32
    epsilon: float = 1e-6  # flax nn.GroupNorm default
    dtype: Optional[Any] = None
    use_relu: bool = False
    # The Pallas path's custom_vjp supports ONE level of reverse-mode AD;
    # second-order meta-gradients (forward-over-reverse) need the pure-XLA
    # formulation — models meta-trained with second_order_gradients must use
    # the 'group_xla'/'group16_xla' norm variants (models/resnet.py).
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.use_pallas and _use_pallas(x):
            from e_osvos_tpu.ops.pallas_group_norm import pallas_group_norm

            y = pallas_group_norm(x, scale, bias, self.num_groups, self.epsilon)
            if self.use_relu:
                y = jnp.maximum(y, 0.0)
        else:
            y = group_norm(
                x, scale, bias, self.num_groups, self.epsilon,
                relu=self.use_relu,
            )
        return y.astype(self.dtype or x.dtype)
