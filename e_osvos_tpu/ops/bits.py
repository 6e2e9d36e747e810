"""Bit-packed binary-mask transfer.

The one-shot deliverable is a binary (per-object) segmentation mask; as
uint8 a 67-frame 480p sequence is ~27 MB, and under a remote-device
runtime the device→host transfer of that buffer dominates small-T
evaluation (PERF.md small-T attribution). Packing 8 pixels/byte on device
cuts the wire bytes 8x; the host unpacks with ``np.unpackbits`` (~ms).
Lossless round-trip; the host-side unpack belongs INSIDE any timing
region so the materialized deliverable is still the full uint8 mask.

No reference equivalent (the reference's masks never leave the GPU box);
this is transport-layer only — scoring/PNG export consume the unpacked
mask unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["pack_mask_bits", "unpack_mask_bits"]

# np.unpackbits order: most-significant bit first. Kept as numpy — a
# module-level jnp constant would initialise the XLA backend at import
# time, which breaks jax.distributed.initialize (multihost.py:39).
_WEIGHTS = np.array([128, 64, 32, 16, 8, 4, 2, 1], np.uint8)


def pack_mask_bits(mask) -> jnp.ndarray:
    """Pack a binary mask along its LAST axis, 8 pixels per byte.

    mask: integer/bool array [..., W] with values in {0, 1}. The last axis
    is zero-padded up to a multiple of 8 (DAVIS 854 → 856). Returns
    uint8 [..., ceil(W/8)], bit order matching ``np.unpackbits``.
    """
    mask = jnp.asarray(mask)
    w = mask.shape[-1]
    pad = (-w) % 8
    if pad:
        mask = jnp.pad(mask, [(0, 0)] * (mask.ndim - 1) + [(0, pad)])
    grouped = mask.reshape(mask.shape[:-1] + (-1, 8)).astype(jnp.uint8)
    return (grouped * _WEIGHTS).sum(axis=-1, dtype=jnp.uint8)


def unpack_mask_bits(packed: np.ndarray, width: int) -> np.ndarray:
    """Host-side inverse: uint8 [..., W/8] → uint8 mask [..., width]."""
    packed = np.asarray(packed, np.uint8)
    bits = np.unpackbits(packed, axis=-1)
    return bits[..., :width]
