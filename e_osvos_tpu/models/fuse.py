"""Conv ↔ frozen-norm fusion and bilinear deconv initialization.

Parity targets:
  * ``merge_batch_norms_with_convs`` (/root/reference/src/networks/
    deeplabv3plus.py:193-257): fold frozen BatchNorm statistics and affine
    terms into the preceding conv's kernel/bias so inference does one fused
    op. Here the fold rewrites the params pytree: for every ``convX`` →
    ``normX`` (FrozenScaleBias) pair, kernel ← kernel·scale, bias ←
    bias·scale + shift, and the norm becomes identity. XLA fuses the
    scale/bias epilogue anyway — this utility exists for checkpoint-surgery
    parity and for exporting fused weights.
  * ``upsample_filt`` / ``interp_surgery`` bilinear deconvolution init
    (/root/reference/src/networks/loss_ce.py:106-132): initialize a
    ConvTranspose kernel to bilinear interpolation.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def bilinear_upsample_kernel(size: int, in_ch: int, out_ch: int) -> np.ndarray:
    """[size, size, in_ch, out_ch] HWIO ConvTranspose kernel performing
    per-channel bilinear upsampling (loss_ce.py:106-117 semantics: identity
    across channels, bilinear within)."""
    factor = (size + 1) // 2
    center = factor - 1 if size % 2 == 1 else factor - 0.5
    og = np.ogrid[:size, :size]
    filt = (1 - abs(og[0] - center) / factor) * (1 - abs(og[1] - center) / factor)
    k = np.zeros((size, size, in_ch, out_ch), np.float32)
    for c in range(min(in_ch, out_ch)):
        k[:, :, c, c] = filt
    return k


def fuse_frozen_norms(
    params: Dict[str, Any], constants: Dict[str, Any]
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Fold every FrozenScaleBias (resnet.py ``frozen_bn``) into the conv
    that precedes it by naming convention (convN/normN, stem_conv/stem_norm,
    down_conv/down_norm).

    Returns (new_params, new_constants) where fused norms have
    scale=1/bias=0. Kernels are HWIO so the output-channel scale broadcasts
    on the last axis."""
    import copy

    new_p = copy.deepcopy(params)
    new_c = copy.deepcopy(constants)

    def visit(p_node, c_node):
        if not isinstance(p_node, dict):
            return
        keys = list(p_node.keys())
        for k in keys:
            if not isinstance(p_node.get(k), dict):
                continue
            norm_name = (
                k.replace("conv", "norm")
                if "conv" in k
                else None
            )
            if (
                norm_name
                and norm_name != k
                and isinstance(c_node, dict)
                and norm_name in c_node
                and "kernel" in p_node[k]
            ):
                scale = np.asarray(c_node[norm_name]["scale"])
                bias = np.asarray(c_node[norm_name]["bias"])
                kern = np.asarray(p_node[k]["kernel"])
                p_node[k]["kernel"] = kern * scale  # HWIO: broadcast on O
                c_node[norm_name]["scale"] = np.ones_like(scale)
                if "bias" in p_node[k]:
                    # conv has its own bias: fold the additive term too
                    old_bias = np.asarray(p_node[k]["bias"])
                    p_node[k]["bias"] = old_bias * scale + bias
                    c_node[norm_name]["bias"] = np.zeros_like(bias)
                # else: the norm keeps its bias (now a pure add, which XLA
                # fuses into the conv epilogue) — our ResNet convs are
                # bias-free, matching the reference's BN-follows-conv layout
            visit(p_node[k], c_node.get(k) if isinstance(c_node, dict) else None)

    visit(new_p, new_c)
    return new_p, new_c
