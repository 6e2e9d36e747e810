"""Pallas TPU GroupNorm: single-pass fused statistics + custom VJP.

The GN-32 backbone (the reference's Mask R-CNN norm swap,
/root/reference/src/networks/mask_rcnn.py:523-534) pays two reduction passes
per layer under XLA. This module makes the reductions explicit Pallas
kernels so the cost is deterministic and memory-bound:

  forward:  one kernel computing per-channel Σx and Σx² in a single read of
            the activation (XLA emits these as two reduces), then the
            normalize as an XLA elementwise (fuses with neighbors);
  backward: one kernel computing per-channel Σdy and Σdy·x in a single read
            of (dy, x), then dx as an XLA elementwise in the per-channel
            affine form dx = A·dy + B·x + D.

Everything keeps C on the 128-lane axis — no grouped reshape of the big
tensor ever happens; group combines run on tiny [N, C] tensors.

Layout contract: x is [N, ..., C]; internally flattened to [N, M, C], which
is a no-op relabeling for NHWC.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

LANE = 128
_SUB = 8  # f32 sublane multiple for the [8, C] stats rows


def _pick_tile(m: int, c: int) -> int:
    """Rows per block: target ~1-2 MB bf16 blocks, sublane-aligned."""
    target = (1 << 21) // max(c * 2, 1)  # ~2MB / row-bytes
    tm = max(_SUB, min(2048, target))
    tm = (tm // _SUB) * _SUB
    return max(tm, _SUB)


def _stats_kernel(x_ref, out_ref, *, m_total: int, tm: int):
    t = pl.program_id(1)
    xb = x_ref[0].astype(jnp.float32)  # [tm, C]
    row = jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0) + t * tm
    xb = jnp.where(row < m_total, xb, 0.0)
    s = jnp.sum(xb, axis=0, keepdims=True)  # [1, C]
    sq = jnp.sum(xb * xb, axis=0, keepdims=True)

    @pl.when(t == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    out_ref[0, 0:1, :] += s
    out_ref[0, 1:2, :] += sq


def _pair_sums_kernel(dy_ref, x_ref, out_ref, *, m_total: int, tm: int):
    t = pl.program_id(1)
    dyb = dy_ref[0].astype(jnp.float32)
    xb = x_ref[0].astype(jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0) + t * tm
    ok = row < m_total
    dyb = jnp.where(ok, dyb, 0.0)
    s1 = jnp.sum(dyb, axis=0, keepdims=True)  # Σdy
    s2 = jnp.sum(dyb * jnp.where(ok, xb, 0.0), axis=0, keepdims=True)  # Σdy·x

    @pl.when(t == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    out_ref[0, 0:1, :] += s1
    out_ref[0, 1:2, :] += s2


def _channel_sums(x: Array, interpret: bool) -> Tuple[Array, Array]:
    """[N, M, C] → (Σx, Σx²) as [N, C] f32, one read of x."""
    n, m, c = x.shape
    tm = _pick_tile(m, c)
    grid = (n, pl.cdiv(m, tm))
    out = pl.pallas_call(
        partial(_stats_kernel, m_total=m, tm=tm),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tm, c), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _SUB, c), lambda i, t: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, _SUB, c), jnp.float32),
        interpret=interpret,
    )(x)
    return out[:, 0], out[:, 1]


def _pair_sums(dy: Array, x: Array, interpret: bool) -> Tuple[Array, Array]:
    """[N, M, C] ×2 → (Σdy, Σdy·x) as [N, C] f32, one read of (dy, x)."""
    n, m, c = x.shape
    tm = _pick_tile(m, c)
    grid = (n, pl.cdiv(m, tm))
    out = pl.pallas_call(
        partial(_pair_sums_kernel, m_total=m, tm=tm),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tm, c), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, c), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _SUB, c), lambda i, t: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, _SUB, c), jnp.float32),
        interpret=interpret,
    )(dy, x)
    return out[:, 0], out[:, 1]


def _group_stats(s: Array, sq: Array, g: int, m_per_group: int, eps: float):
    """Channel sums [N, C] → per-group (mean, rstd) [N, G] (tiny)."""
    n, c = s.shape
    gs = jnp.sum(s.reshape(n, g, c // g), axis=-1)
    gsq = jnp.sum(sq.reshape(n, g, c // g), axis=-1)
    mean = gs / m_per_group
    var = jnp.maximum(gsq / m_per_group - mean * mean, 0.0)
    return mean, jax.lax.rsqrt(var + eps)


def _expand(t: Array, c: int) -> Array:
    """[N, G] → [N, C] per-channel broadcast (tiny tensor)."""
    g = t.shape[-1]
    return jnp.repeat(t, c // g, axis=-1)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def pallas_group_norm(
    x: Array,
    scale: Array,
    bias: Array,
    num_groups: int,
    eps: float = 1e-6,
    interpret: bool = False,
) -> Array:
    """GroupNorm over [N, ..., C] matching ``flax.linen.GroupNorm``."""
    y, _ = _fwd(x, scale, bias, num_groups, eps, interpret)
    return y


def _fwd(x, scale, bias, num_groups, eps, interpret):
    orig_shape = x.shape
    n, c = x.shape[0], x.shape[-1]
    assert c % num_groups == 0
    m = math.prod(x.shape[1:-1])
    xf = x.reshape(n, m, c)
    s, sq = _channel_sums(xf, interpret)
    m_per_group = m * (c // num_groups)
    mean, rstd = _group_stats(s, sq, num_groups, m_per_group, eps)
    mean_c = _expand(mean, c)
    rstd_c = _expand(rstd, c)
    a = rstd_c * scale.astype(jnp.float32)[None]
    b = bias.astype(jnp.float32)[None] - mean_c * a
    bshape = (n,) + (1,) * (len(orig_shape) - 2) + (c,)
    y = (
        x.astype(jnp.float32) * a.reshape(bshape) + b.reshape(bshape)
    ).astype(x.dtype)
    return y, (x, scale, mean, rstd)


def _bwd(num_groups, eps, interpret, res, dy):
    x, scale, mean, rstd = res
    orig_shape = x.shape
    n, c = x.shape[0], x.shape[-1]
    g = num_groups
    m = math.prod(x.shape[1:-1])
    m_per_group = m * (c // g)

    s1, s2 = _pair_sums(
        dy.reshape(n, m, c), x.reshape(n, m, c), interpret
    )  # Σdy, Σdy·x per channel [N, C] f32

    mean_c = _expand(mean, c)  # [N, C]
    rstd_c = _expand(rstd, c)
    gamma = scale.astype(jnp.float32)[None]  # [1, C]

    # parameter grads: xhat-sums from the channel sums
    sum_dy_xhat = rstd_c * (s2 - mean_c * s1)  # [N, C]
    dgamma = jnp.sum(sum_dy_xhat, axis=0).astype(scale.dtype)
    dbeta = jnp.sum(s1, axis=0).astype(scale.dtype)

    # group reductions of the gamma-weighted sums (tiny)
    c1 = jnp.sum((gamma * s1).reshape(n, g, c // g), axis=-1)  # Σ dy·γ
    c2 = jnp.sum((gamma * sum_dy_xhat).reshape(n, g, c // g), axis=-1)  # Σ dy·γ·x̂

    # dx = rstd·γ·dy − rstd/m·(c1 + x̂·c2)
    #    = A·dy + B·x + D with per-channel coefficients
    rg = rstd  # [N, G]
    A = rstd_c * gamma  # [N, C]
    B = _expand(-(rg * rg) * c2 / m_per_group, c)  # [N, C]
    D = _expand(
        (rg * rg * c2 * mean - rg * c1) / m_per_group, c
    )  # [N, C]

    bshape = (n,) + (1,) * (len(orig_shape) - 2) + (c,)
    dx = (
        dy.astype(jnp.float32) * A.reshape(bshape)
        + x.astype(jnp.float32) * B.reshape(bshape)
        + D.reshape(bshape)
    ).astype(x.dtype)
    return dx, dgamma, dbeta


pallas_group_norm.defvjp(_fwd, _bwd)
