"""Feature Pyramid Network on the ResNet C2..C5 taps (Flax, NHWC).

Capability parity: the reference uses torchvision's
``resnet_fpn_backbone('resnet50')`` (/root/reference/src/networks/
mask_rcnn.py:431) — lateral 1x1 convs to 256 channels, top-down nearest
2x upsampling with additive merge, 3x3 output convs, and a stride-2
max-pool extra level (P6) for the RPN.

TPU-first: NHWC; nearest upsample is a reshape-broadcast (no gather);
channel width fixed at 256 so every level's convs tile the MXU the same way.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def upsample2x_nearest(x: Array) -> Array:
    """[B,H,W,C] → [B,2H,2W,C] nearest-neighbor, as broadcast+reshape."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class FPN(nn.Module):
    """C2..C5 → P2..P6 (all ``out_ch`` channels)."""

    out_ch: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Dict[str, Array]) -> List[Array]:
        cs = [feats["C2"], feats["C3"], feats["C4"], feats["C5"]]
        laterals = [
            nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name=f"lateral{i + 2}")(c)
            for i, c in enumerate(cs)
        ]
        # top-down pathway
        ps = [laterals[-1]]
        for lat in laterals[-2::-1]:
            up = upsample2x_nearest(ps[0])
            # crop in case of odd input sizes
            up = up[:, : lat.shape[1], : lat.shape[2], :]
            ps.insert(0, lat + up)
        outs = [
            nn.Conv(
                self.out_ch, (3, 3), padding="SAME", dtype=self.dtype,
                name=f"output{i + 2}",
            )(p)
            for i, p in enumerate(ps)
        ]
        # P6 for RPN only (torchvision LastLevelMaxPool)
        p6 = nn.max_pool(outs[-1], (1, 1), strides=(2, 2))
        outs.append(p6)
        return outs  # [P2, P3, P4, P5, P6]
