"""Import torchvision-format checkpoints into the Flax model zoo.

The reference bootstraps from torchvision COCO/ImageNet checkpoints via
shape-matched state-dict copy (/root/reference/src/networks/
mask_rcnn.py:467-475, deeplabv3plus.py:120-133 checkpoint surgery). This
module provides the equivalent for the TPU rebuild: an explicit name map for
the ResNet trunk (torch OIHW → flax HWIO) plus the same shape-matched-copy
fallback for head weights, so existing parent checkpoints can seed
meta-training without a torch runtime on the TPU host (torch CPU is only
needed to unpickle the file).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def conv_to_hwio(w: np.ndarray) -> np.ndarray:
    """torch conv weight [O,I,kH,kW] → flax [kH,kW,I,O]."""
    return np.transpose(w, (2, 3, 1, 0))


def dense_to_flax(w: np.ndarray) -> np.ndarray:
    """torch linear weight [O,I] → flax [I,O]."""
    return np.transpose(w, (1, 0))


def resnet_name_map(torch_key: str) -> str | None:
    """torchvision resnet key → our ResNet module path (resnet.py naming).

    Norm layers map onto whatever norm the flax model was built with: the
    reference's GroupNorm swap keeps BN's [C] weight/bias shapes, so the
    shape-matched copy applies identically (mask_rcnn.py:523-534).
    """
    k = torch_key
    if k.startswith("backbone.body."):
        k = k[len("backbone.body."):]
    if k.startswith("backbone."):
        k = k[len("backbone."):]
    if k in ("conv1.weight",):
        return "stem_conv/kernel"
    if k.startswith("bn1."):
        return f"stem_norm/{_norm_param(k.split('.')[-1])}"
    m = re.match(r"layer(\d)\.(\d+)\.(.*)", k)
    if not m:
        return None
    stage, block, rest = int(m.group(1)), int(m.group(2)), m.group(3)
    base = f"layer{stage}_block{block}"
    cm = re.match(r"conv(\d)\.weight", rest)
    if cm:
        return f"{base}/conv{cm.group(1)}/kernel"
    bm = re.match(r"bn(\d)\.(\w+)", rest)
    if bm:
        return f"{base}/norm{bm.group(1)}/{_norm_param(bm.group(2))}"
    dm = re.match(r"downsample\.0\.weight", rest)
    if dm:
        return f"{base}/down_conv/kernel"
    dn = re.match(r"downsample\.1\.(\w+)", rest)
    if dn:
        return f"{base}/down_norm/{_norm_param(dn.group(1))}"
    return None


def _norm_param(torch_name: str) -> str | None:
    return {
        "weight": "scale",
        "bias": "bias",
        "running_mean": "mean",
        "running_var": "var",
    }.get(torch_name)


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/" if prefix or True else k))
    else:
        out[prefix[:-1]] = tree
    return out


def _unflatten(flat: Dict[str, Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in flat.items():
        node = out
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def load_resnet_from_torch(
    params: Dict[str, Any],
    torch_state_dict: Dict[str, Any],
    backbone_prefix: str = "backbone",
) -> Tuple[Dict[str, Any], int]:
    """Copy a torchvision resnet50/101 state dict into our params tree.

    ``params`` is the flax 'params' collection (possibly nested under
    ``backbone_prefix``). Returns (new_params, num_copied). Only leaves
    whose mapped name exists AND whose (transposed) shape matches are
    copied — the reference's shape-matched-copy semantics."""
    flat = _flatten(params)
    copied = 0
    for tk, tv in torch_state_dict.items():
        mapped = resnet_name_map(tk)
        if mapped is None:
            continue
        arr = _to_numpy(tv)
        if mapped.endswith("/kernel") and arr.ndim == 4:
            arr = conv_to_hwio(arr)
        for candidate in (
            f"{backbone_prefix}/{mapped}",
            mapped,
        ):
            if candidate in flat and tuple(flat[candidate].shape) == tuple(arr.shape):
                flat[candidate] = arr.astype(np.asarray(flat[candidate]).dtype)
                copied += 1
                break
    return _unflatten(flat), copied


def shape_matched_load(
    params: Dict[str, Any], torch_state_dict: Dict[str, Any]
) -> Tuple[Dict[str, Any], int]:
    """Greedy shape-matched copy in declaration order — the reference's
    COCO-weight surgery (mask_rcnn.py:467-475) generalized: each torch
    tensor is consumed by the first same-shape unfilled flax leaf (conv and
    dense weights are transposed first)."""
    flat = _flatten(params)
    keys = list(flat.keys())
    used = set()
    copied = 0
    for tk, tv in torch_state_dict.items():
        arr = _to_numpy(tv)
        cands = [arr]
        if arr.ndim == 4:
            cands.insert(0, conv_to_hwio(arr))
        if arr.ndim == 2:
            cands.insert(0, dense_to_flax(arr))
        done = False
        for a in cands:
            for k in keys:
                if k in used:
                    continue
                if tuple(flat[k].shape) == tuple(a.shape):
                    flat[k] = a.astype(np.asarray(flat[k]).dtype)
                    used.add(k)
                    copied += 1
                    done = True
                    break
            if done:
                break
    return _unflatten(flat), copied


def load_torch_file(path: str) -> Dict[str, Any]:
    """Unpickle a .pth state dict with CPU torch."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return sd
