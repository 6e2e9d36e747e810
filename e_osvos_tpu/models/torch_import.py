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


def deeplab_name_map(torch_key: str, variant: str = "v3plus") -> str | None:
    """Reference DeepLabV3/V3+ state-dict key → our flax module path.

    Key vocabulary per the reference model classes:
      - ``backbone.*`` — torchvision resnet inside IntermediateLayerGetter
        (/root/reference/src/networks/deeplabv3plus.py:113-118)
      - ``classifier.0.*`` — torchvision ASPP (convs.0 = 1x1 branch,
        convs.1-3 = dilated branches, convs.4 = pooling branch, project)
        wrapped by DeepLabHead (deeplabv3plus.py:15-20)
      - V3+ ``decoder.*`` — conv1/bn1 low-level reduce + last_conv
        Sequential{0:conv,1:bn,4:conv,5:bn,8:classifier}
        (deeplabv3plus.py:69-81)
      - plain V3 ``classifier.{1,2,4}`` — torchvision DeepLabHead tail
        (3x3 conv, BN, final 1x1) (/root/reference/src/networks/
        deeplabv3.py:24-42 loads it unchanged)
    """
    k = torch_key
    if k.startswith("backbone."):
        mapped = resnet_name_map(k)
        return f"backbone/{mapped}" if mapped else None
    if k.startswith("aux_classifier."):
        return None  # dropped by the reference surgery too (deeplabv3.py:37-39)
    m = re.match(r"classifier\.0\.convs\.(\d)\.(\d)\.(\w+)", k)
    if m:
        branch, idx, pname = int(m.group(1)), int(m.group(2)), m.group(3)
        if branch <= 3:  # Sequential(conv, norm, relu)
            mod = f"b{branch}_conv" if idx == 0 else f"b{branch}_norm"
        else:  # pooling branch: Sequential(pool, conv, norm, relu)
            mod = "pool_conv" if idx == 1 else "pool_norm"
        p = "kernel" if mod.endswith("_conv") else _norm_param(pname)
        return f"aspp/{mod}/{p}" if p else None
    m = re.match(r"classifier\.0\.project\.(\d)\.(\w+)", k)
    if m:
        idx, pname = int(m.group(1)), m.group(2)
        if idx == 0:
            return "aspp/proj_conv/kernel"
        p = _norm_param(pname)
        return f"aspp/proj_norm/{p}" if p else None
    if variant == "v3plus":
        m = re.match(r"decoder\.conv1\.weight", k)
        if m:
            return "low_conv/kernel"
        m = re.match(r"decoder\.bn1\.(\w+)", k)
        if m:
            p = _norm_param(m.group(1))
            return f"low_norm/{p}" if p else None
        m = re.match(r"decoder\.last_conv\.(\d)\.(\w+)", k)
        if m:
            idx, pname = int(m.group(1)), m.group(2)
            if idx == 8:  # final 1x1 classifier (has bias)
                return f"classifier/{'kernel' if pname == 'weight' else 'bias'}"
            mod = {0: "dec_conv1", 1: "dec_norm1", 4: "dec_conv2",
                   5: "dec_norm2"}.get(idx)
            if mod is None:
                return None
            if mod.endswith("_conv") or mod.startswith("dec_conv"):
                return f"{mod}/kernel" if pname == "weight" else None
            p = _norm_param(pname)
            return f"{mod}/{p}" if p else None
        return None
    # plain V3 head tail
    m = re.match(r"classifier\.1\.weight", k)
    if m:
        return "head_conv/kernel"
    m = re.match(r"classifier\.2\.(\w+)", k)
    if m:
        p = _norm_param(m.group(1))
        return f"head_norm/{p}" if p else None
    m = re.match(r"classifier\.4\.(\w+)", k)
    if m:
        return f"classifier/{'kernel' if m.group(1) == 'weight' else 'bias'}"
    return None


def maskrcnn_name_map(torch_key: str) -> str | None:
    """torchvision MaskRCNN state-dict key → our flax module path.

    Covers the module set the reference trains (/root/reference/src/
    networks/mask_rcnn.py:425-465): resnet50-FPN backbone, RPN head, box
    head + predictor, mask head + predictor. The reference's GroupNorm swap
    (mask_rcnn.py:523-534) keeps the BN key names, so this map serves both
    BN and GN checkpoints.
    """
    k = torch_key
    if k.startswith("backbone.body."):
        mapped = resnet_name_map(k)
        return f"backbone/{mapped}" if mapped else None
    m = re.match(r"backbone\.fpn\.(inner|layer)_blocks\.(\d)(?:\.0)?\.(weight|bias)", k)
    if m:
        kind, i, pname = m.group(1), int(m.group(2)), m.group(3)
        mod = f"lateral{i + 2}" if kind == "inner" else f"output{i + 2}"
        return f"fpn/{mod}/{'kernel' if pname == 'weight' else 'bias'}"
    m = re.match(r"rpn\.head\.(conv|cls_logits|bbox_pred)(?:\.0\.0)?\.(weight|bias)", k)
    if m:
        return (
            f"rpn_head/{m.group(1)}/"
            f"{'kernel' if m.group(2) == 'weight' else 'bias'}"
        )
    m = re.match(r"roi_heads\.box_head\.fc([67])\.(weight|bias)", k)
    if m:
        return (
            f"box_head/fc{m.group(1)}/"
            f"{'kernel' if m.group(2) == 'weight' else 'bias'}"
        )
    m = re.match(r"roi_heads\.box_predictor\.(cls_score|bbox_pred)\.(weight|bias)", k)
    if m:
        return (
            f"box_head/{m.group(1)}/"
            f"{'kernel' if m.group(2) == 'weight' else 'bias'}"
        )
    m = re.match(r"roi_heads\.mask_head\.mask_fcn(\d)(?:\.0)?\.(weight|bias)", k)
    if m:
        return (
            f"mask_head/mask_fcn{m.group(1)}/"
            f"{'kernel' if m.group(2) == 'weight' else 'bias'}"
        )
    m = re.match(r"roi_heads\.mask_predictor\.conv5_mask\.(weight|bias)", k)
    if m:
        return f"mask_head/deconv/{'kernel' if m.group(1) == 'weight' else 'bias'}"
    m = re.match(r"roi_heads\.mask_predictor\.mask_fcn_logits\.(weight|bias)", k)
    if m:
        return (
            f"mask_head/mask_logits/"
            f"{'kernel' if m.group(1) == 'weight' else 'bias'}"
        )
    return None


def detect_torch_architecture(torch_state_dict: Dict[str, Any]) -> str:
    """Which reference model family a state dict belongs to, from its key
    vocabulary: 'maskrcnn' | 'deeplab_v3plus' | 'deeplab_v3' | 'resnet' |
    'unknown'."""
    keys = list(torch_state_dict.keys())
    if any(k.startswith("roi_heads.") for k in keys):
        return "maskrcnn"
    if any(k.startswith("decoder.last_conv") for k in keys):
        return "deeplab_v3plus"
    if any(k.startswith("classifier.0.convs") for k in keys):
        return "deeplab_v3"
    if any(k.startswith(("layer1.", "conv1.", "backbone.")) for k in keys):
        return "resnet"
    return "unknown"


def _fc6_to_flax(w: np.ndarray, pooled_hw: Tuple[int, int] = (7, 7)) -> np.ndarray:
    """Box-head fc6 weight: torch flattens the pooled ROI [C,H,W] C-major,
    flax flattens [H,W,C] — reorder the input dimension before transposing.
    A plain transpose silently misroutes every feature (same shape!)."""
    out_dim, in_dim = w.shape
    h, wd = pooled_hw
    c = in_dim // (h * wd)
    if c * h * wd != in_dim:
        return dense_to_flax(w)
    w = w.reshape(out_dim, c, h, wd).transpose(0, 2, 3, 1).reshape(out_dim, in_dim)
    return dense_to_flax(w)


def _deconv_to_flax(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight [I,O,kH,kW] → flax ConvTranspose
    [kH,kW,I,O]. flax's ConvTranspose runs a fractionally-strided *forward*
    conv (lax.conv_transpose, transpose_kernel=False) while torch uses the
    conv-gradient convention, so the spatial taps must also be flipped."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def _strip_collection(key: str) -> str:
    head, _, rest = key.partition("/")
    if head in ("params", "constants", "batch_stats"):
        return rest
    return key


def load_mapped_from_torch(
    variables: Dict[str, Any],
    torch_state_dict: Dict[str, Any],
    architecture: str | None = None,
    bn_eps: float = 1e-5,
) -> Tuple[Dict[str, Any], int]:
    """Name-mapped import of a reference checkpoint into flax variables.

    ``variables`` may be a full flax variables dict (params + constants /
    batch_stats collections) or a bare params tree. Tensors are copied only
    where the mapped path exists and the (layout-converted) shape matches —
    the reference's shape-matched-copy rule (mask_rcnn.py:467-475), so
    COCO's 91-class heads are skipped for a 2-class model exactly as the
    reference does. BatchNorm running statistics fold into frozen
    scale/bias targets (``frozen_bn`` norms) when the template has no
    mean/var leaves: scale' = w/sqrt(var+eps), bias' = b − mean·scale'.
    Returns (new_variables, num_torch_tensors_consumed)."""
    if architecture is None:
        architecture = detect_torch_architecture(torch_state_dict)
    if architecture == "maskrcnn":
        name_map = maskrcnn_name_map
    elif architecture == "deeplab_v3plus":
        name_map = lambda k: deeplab_name_map(k, "v3plus")
    elif architecture == "deeplab_v3":
        name_map = lambda k: deeplab_name_map(k, "v3")
    elif architecture == "resnet":
        name_map = resnet_name_map
    else:
        raise ValueError(f"cannot name-map architecture {architecture!r}")

    flat = _flatten(variables)
    # module path (collection stripped) → full flat key
    by_path: Dict[str, str] = {}
    for k in flat:
        by_path.setdefault(_strip_collection(k), k)

    copied = 0
    # norm groups whose torch side carries running stats: path-prefix →
    # {param: array}; resolved in a second pass (fold or direct copy)
    norm_groups: Dict[str, Dict[str, np.ndarray]] = {}
    for tk, tv in torch_state_dict.items():
        if tk.endswith("num_batches_tracked"):
            continue
        mapped = name_map(tk)
        if mapped is None:
            continue
        arr = _to_numpy(tv)
        base, _, leaf = mapped.rpartition("/")
        is_norm_module = "norm" in base.rsplit("/", 1)[-1]
        if leaf in ("scale", "bias", "mean", "var") and is_norm_module:
            norm_groups.setdefault(base, {})[leaf] = arr
            continue
        if leaf == "kernel" and arr.ndim == 4:
            arr = (
                _deconv_to_flax(arr)
                if mapped.endswith("deconv/kernel")
                else conv_to_hwio(arr)
            )
        elif leaf == "kernel" and arr.ndim == 2:
            arr = (
                _fc6_to_flax(arr)
                if mapped.endswith("fc6/kernel")
                else dense_to_flax(arr)
            )
        fk = by_path.get(mapped)
        if fk is not None and tuple(flat[fk].shape) == tuple(arr.shape):
            flat[fk] = arr.astype(np.asarray(flat[fk]).dtype)
            copied += 1

    for base, group in norm_groups.items():
        scale_key = by_path.get(f"{base}/scale")
        bias_key = by_path.get(f"{base}/bias")
        if scale_key is None or bias_key is None:
            continue
        has_stats_target = (
            f"{base}/mean" in by_path and f"{base}/var" in by_path
        )
        w = group.get("scale")
        b = group.get("bias")
        mean = group.get("mean")
        var = group.get("var")
        if w is None or b is None:
            continue
        if tuple(flat[scale_key].shape) != tuple(w.shape):
            continue
        if mean is not None and var is not None and not has_stats_target:
            # fold frozen BN stats into scale/bias (fuse.py semantics)
            s = w / np.sqrt(var + bn_eps)
            w, b = s, b - mean * s
        flat[scale_key] = w.astype(np.asarray(flat[scale_key]).dtype)
        flat[bias_key] = b.astype(np.asarray(flat[bias_key]).dtype)
        copied += 2
        if mean is not None and var is not None and has_stats_target:
            mk, vk = by_path[f"{base}/mean"], by_path[f"{base}/var"]
            flat[mk] = mean.astype(np.asarray(flat[mk]).dtype)
            flat[vk] = var.astype(np.asarray(flat[vk]).dtype)
            copied += 2
    return _unflatten(flat), copied


def _lr_to_flax(arr: np.ndarray, mapped: str, param_shape: tuple) -> np.ndarray | None:
    """Convert a reference NEURON/PARAM learning-rate tensor to our lr-tree
    leaf layout.

    The reference stores one lr per *output neuron* as shape (C, 1, ...) on
    torch OIHW/| (out,in) layouts (meta_optim.py:46-67); our lr tree keeps
    the output axis last to match flax HWIO/(in,out) layouts (lr_tree.py).
    ConvTranspose is the one asymmetric case: torch dim 0 of an [I,O,kH,kW]
    deconv weight is the *input* channel, so its per-dim-0 lr lands on the
    flax kernel's axis 2. PARAM-level lrs reuse the kernel transforms.
    Returns None when the tensor cannot be interpreted for ``param_shape``.
    """
    is_deconv = mapped.endswith("deconv/kernel")
    # PARAM granularity: full param shape → same transforms as the weights
    if arr.ndim == len(param_shape) and arr.size == int(np.prod(param_shape)):
        if arr.ndim == 4:
            return _deconv_to_flax(arr) if is_deconv else conv_to_hwio(arr)
        if arr.ndim == 2:
            return (_fc6_to_flax(arr) if mapped.endswith("fc6/kernel")
                    else dense_to_flax(arr))
        return arr
    # NEURON granularity: (C, 1, ...) with C on torch dim 0
    flatc = arr.reshape(-1)
    c = flatc.shape[0]
    if len(param_shape) == 0:
        return flatc.reshape(()) if c == 1 else None
    if is_deconv and len(param_shape) == 4 and c == param_shape[2]:
        return flatc.reshape(1, 1, c, 1)
    if c == param_shape[-1]:
        return flatc.reshape((1,) * (len(param_shape) - 1) + (c,))
    return None


def import_meta_checkpoint_from_torch(
    meta_params,
    torch_ckpt: Dict[str, Any],
    architecture: str | None = None,
):
    """Import a reference meta-training checkpoint (``*.model``) into our
    MetaParams.

    The reference saves ``{meta_optim_state_dict, vis_win_names, meta_iter,
    meta_epoch}`` (train_meta.py:278-286) where the state dict holds the
    learned model init as ``model_init_<param-name with . → ->`` and the
    learned per-neuron log lrs as ``log_init_lr_<...>``
    (meta_optim.py:46-78). Both groups are de-mangled and routed through
    the architecture name map; lr tensors additionally move from the torch
    output-axis-first convention to our output-axis-last lr-tree layout.

    Note the checkpoint carries only *trainable* tensors — frozen-BN
    statistics (``constants``) keep the template's values, so pair this
    with the matching parent ``.pth`` when the model uses frozen BN.
    Returns (new_meta_params, init_copied, lr_copied)."""
    sd = torch_ckpt.get("meta_optim_state_dict", torch_ckpt)
    init_sd: Dict[str, Any] = {}
    lr_sd: Dict[str, Any] = {}
    for k, v in sd.items():
        if k.startswith("model_init_"):
            init_sd[k[len("model_init_"):].replace("-", ".")] = v
        elif k.startswith("log_init_lr_"):
            lr_sd[k[len("log_init_lr_"):].replace("-", ".")] = v
        elif k == "log_init_lr":
            raise ValueError(
                "checkpoint uses SINGLE/TENSOR lr granularity (one shared "
                "'log_init_lr' tensor); only NEURON/PARAM per-parameter lrs "
                "are importable (the published configuration, "
                "cfgs/meta.yaml:37)"
            )
    if architecture is None:
        architecture = detect_torch_architecture(init_sd or lr_sd)

    init_copied = 0
    model_init = meta_params.model_init
    if model_init is not None and init_sd:
        model_init, init_copied = load_mapped_from_torch(
            model_init, init_sd, architecture
        )

    # lr tree: same name map as the weights, custom shape conversion
    if architecture == "maskrcnn":
        name_map = maskrcnn_name_map
    elif architecture == "deeplab_v3plus":
        name_map = lambda k: deeplab_name_map(k, "v3plus")
    elif architecture == "deeplab_v3":
        name_map = lambda k: deeplab_name_map(k, "v3")
    else:
        name_map = resnet_name_map
    flat_lr = _flatten(meta_params.log_init_lr)
    by_path = {}
    for k in flat_lr:
        by_path.setdefault(_strip_collection(k), k)
    # param shapes tell NEURON from PARAM granularity and validate axes
    flat_init = _flatten(meta_params.model_init) if meta_params.model_init else {}
    param_shape_by_path = {
        _strip_collection(k): tuple(np.shape(v)) for k, v in flat_init.items()
    }
    lr_copied = 0
    for tk, tv in lr_sd.items():
        mapped = name_map(tk)
        if mapped is None:
            continue
        fk = by_path.get(mapped)
        if fk is None:
            continue
        pshape = param_shape_by_path.get(mapped)
        if pshape is None:
            continue
        arr = _lr_to_flax(_to_numpy(tv), mapped, pshape)
        if arr is None or tuple(arr.shape) != tuple(np.shape(flat_lr[fk])):
            continue
        flat_lr[fk] = arr.astype(np.asarray(flat_lr[fk]).dtype)
        lr_copied += 1
    return (
        meta_params._replace(
            model_init=model_init, log_init_lr=_unflatten(flat_lr)
        ),
        init_copied,
        lr_copied,
    )


def load_torch_file(path: str) -> Dict[str, Any]:
    """Unpickle a .pth/.model file with CPU torch. Reference ``.model``
    meta checkpoints carry non-tensor metadata (vis window names, iteration
    counters), which newer torch rejects under weights_only — fall back."""
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return sd
