"""Pallas TPU kernel for padded greedy NMS.

The XLA fallback (ops/nms.py) re-reads the box tensor from HBM every
suppression round. This kernel pins boxes / scores / alive-mask in VMEM for
the whole greedy loop: per round it does one VPU argmax over the masked
scores, reconstructs the winner's coordinates with a masked reduction
(dynamic lane indexing is not a TPU-friendly access pattern), computes
one-vs-all IoU in registers, and updates the alive mask in place. All state
is [8, N]-tiled float32; N is padded to a lane multiple by the wrapper.

Design notes (per /opt/skills/guides/pallas_guide.md):
  * boxes are stored transposed [4, N] so the lane axis is N (128-multiple);
  * the winner's coords come from `sum(where(lane==best, row, 0))` — a
    masked VPU reduction instead of a scalar gather;
  * outputs are [1, max_out] int32/bool written with dynamic `pl.ds` stores;
  * everything runs in one grid step (no pipelining needed: the whole
    working set for N ≤ 16384 is ~0.5 MB of VMEM).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

LANE = 128


def _nms_kernel(boxes_ref, scores_ref, valid_ref, thresh_ref,
                idx_ref, keep_ref):
    n = scores_ref.shape[1]
    max_out = idx_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (1, max_out), 1)

    x1 = boxes_ref[0:1, :]
    y1 = boxes_ref[1:2, :]
    x2 = boxes_ref[2:3, :]
    y2 = boxes_ref[3:4, :]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    thresh = thresh_ref[0, 0]
    neg_inf = jnp.float32(-jnp.inf)

    def body(i, state):
        # outputs ride the carry as [1, max_out] vectors — Mosaic has no
        # scalar stores to VMEM, so results are written once at the end;
        # everything stays 2-D [1, N] int32/float32 (Mosaic-friendly: no
        # argmax, no 1-D vectors, no bool carries)
        alive, idx_vec, keep_vec = state
        alive_b = alive > 0
        masked = jnp.where(alive_b, scores_ref[0:1, :], neg_inf)
        best_score = jnp.max(masked)
        ok = best_score > neg_inf
        # first lane achieving the max (argmax tie-break semantics)
        at_max = alive_b & (masked >= best_score)
        best = jnp.min(jnp.where(at_max, lane, n)).astype(jnp.int32)
        sel = lane == best

        def pick(row):
            return jnp.sum(jnp.where(sel, row, 0.0))

        bx1, by1, bx2, by2 = pick(x1), pick(y1), pick(x2), pick(y2)
        barea = jnp.maximum(bx2 - bx1, 0.0) * jnp.maximum(by2 - by1, 0.0)
        iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = iw * ih
        union = area + barea - inter
        iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)

        keep_alive = alive_b & (iou <= thresh) & (lane != best) & ok
        alive = keep_alive.astype(jnp.int32)
        here = out_lane == i
        idx_vec = jnp.where(here & ok, best, idx_vec)
        keep_vec = jnp.where(here & ok, 1, keep_vec)
        return alive, idx_vec, keep_vec

    alive0 = (
        (valid_ref[0:1, :] > 0) & (scores_ref[0:1, :] > neg_inf)
    ).astype(jnp.int32)
    idx0 = jnp.full((1, max_out), -1, jnp.int32)
    keep0 = jnp.zeros((1, max_out), jnp.int32)
    _, idx_vec, keep_vec = jax.lax.fori_loop(
        0, max_out, body, (alive0, idx0, keep0)
    )
    idx_ref[:, :] = idx_vec
    keep_ref[:, :] = keep_vec


def nms_pallas(
    boxes: Array,
    scores: Array,
    iou_threshold: float,
    max_out: int,
    valid: Array | None = None,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Drop-in replacement for ops.nms.nms backed by the Pallas kernel."""
    n = boxes.shape[0]
    n_pad = ((n + LANE - 1) // LANE) * LANE
    pad = n_pad - n
    boxes_t = jnp.pad(boxes.T.astype(jnp.float32), ((0, 0), (0, pad)))
    scores_p = jnp.pad(
        scores.astype(jnp.float32)[None], ((0, 0), (0, pad)),
        constant_values=-jnp.inf,
    )
    v = jnp.ones((n,), jnp.int32) if valid is None else valid.astype(jnp.int32)
    valid_p = jnp.pad(v[None], ((0, 0), (0, pad)))

    idx, keep = pl.pallas_call(
        _nms_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, max_out), jnp.int32),
            jax.ShapeDtypeStruct((1, max_out), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(boxes_t, scores_p, valid_p, jnp.array([[iou_threshold]], jnp.float32))
    return idx[0], keep[0].astype(jnp.bool_)


def nms_auto(boxes, scores, iou_threshold, max_out, valid=None):
    """Backend dispatch: Pallas kernel on TPU, XLA fallback elsewhere."""
    from e_osvos_tpu.ops.nms import nms as nms_xla

    if jax.default_backend() == "tpu":
        return nms_pallas(boxes, scores, iou_threshold, max_out, valid)
    return nms_xla(boxes, scores, iou_threshold, max_out, valid)
