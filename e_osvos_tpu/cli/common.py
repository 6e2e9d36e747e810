"""Shared CLI plumbing: config → model / datasets / meta-params.

Rebuilds the reference's init_parent_model + data_loaders wiring
(/root/reference/src/util/helper_func.py:250-385) on top of the dict config
tree (e_osvos_tpu/config.py)."""

from __future__ import annotations

import os
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from e_osvos_tpu import config as cfglib
from e_osvos_tpu.data.datasets import DAVISIndex, YouTubeVOSIndex
from e_osvos_tpu.meta_optim import MetaParams, init_meta_params
from e_osvos_tpu.models import build_model
from e_osvos_tpu.utils import load_checkpoint


def build_parent_model(cfg: Dict):
    """Architecture factory from the ``parent_model`` subtree (parity:
    init_parent_model, helper_func.py:339-357)."""
    pm = cfg.get("parent_model", {})
    arch = pm.get("architecture", "DeepLabV3Plus")
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        pm.get("dtype", "bfloat16")
    ]
    kwargs: Dict[str, Any] = {"dtype": dtype}
    if arch in ("DeepLabV3", "DeepLabV3Plus"):
        kwargs.update(
            arch=pm.get("encoder", "resnet50"),
            backbone_norm=pm.get("backbone_norm", "group"),
            head_norm=pm.get("decoder_norm_layer", "group16"),
            output_stride=int(pm.get("output_stride", 8)),
            num_classes=1,
        )
    elif arch == "MaskRCNN":
        from e_osvos_tpu.models import RoIConfig

        roi_sizes = pm.get("roi_pool_output_sizes", {})
        kwargs.update(
            arch=pm.get("encoder", "resnet50"),
            backbone_norm=pm.get("backbone_norm", "group"),
            roi=RoIConfig(
                box_roi_size=int(roi_sizes.get("box", 7)),
                nms_thresh=float(pm.get("box_nms_thresh", 0.5)),
                mask_loss=str(pm.get("maskrcnn_loss", "LOVASZ")).lower(),
                detections_per_img=int(pm.get("detections_per_img", 1)),
            ),
        )
    return build_model(arch, **kwargs)


def init_model_params(cfg: Dict, model, input_hw=(480, 864)):
    x = jnp.zeros((1,) + tuple(input_hw) + (3,), jnp.float32)
    params = model.init(jax.random.PRNGKey(int(cfg.get("seed", 1))), x)
    ckpt = cfg.get("parent_model", {}).get("checkpoint")
    if ckpt:
        params, _ = load_checkpoint(ckpt, params)
    return params


def build_indexes(cfg: Dict, role: str = "train") -> List:
    """Dataset indexers for a config role (train/val/test). Supports the
    reference's list-form multi-dataset train spec
    (cfgs/meta_youtube-vos.yaml datasets.train.name list)."""
    ds = cfg.get("datasets", {}).get(role)
    if ds is None:
        return []
    names = ds["name"] if isinstance(ds["name"], list) else [ds["name"]]
    splits = ds["split"] if isinstance(ds["split"], list) else [ds["split"]]
    roots = ds["root"] if isinstance(ds["root"], list) else [ds["root"]]
    multi = cfg.get("data_cfg", {}).get("multi_object", "single_id")
    mode = "all" if multi in ("all", False) else "single_id"
    indexes = []
    for name, split, root in zip(names, splits, roots):
        if name.startswith("DAVIS"):
            year = name.split("-")[-1]
            res = (
                "Full-Resolution"
                if cfg.get("data_cfg", {}).get("full_resolution")
                else "480p"
            )
            indexes.append(
                DAVISIndex(root, split=split, year=year, resolution=res,
                           multi_object=mode)
            )
        elif name == "YouTube-VOS":
            indexes.append(YouTubeVOSIndex(root, split=split, multi_object=mode))
        elif name == "Synthetic":
            # in-memory moving-squares fixture (data/synthetic.py) — lets the
            # full CLI run end-to-end without datasets on disk
            from e_osvos_tpu.data.synthetic import SyntheticVOSIndex

            syn = cfg.get("synthetic", {})
            indexes.append(
                SyntheticVOSIndex(
                    num_sequences=int(syn.get("num_sequences", 2)),
                    num_frames=int(syn.get("num_frames", 4)),
                    size=tuple(syn.get("size", (64, 64))),
                    num_objects=int(syn.get("num_objects", 1)),
                    multi_object=mode,
                    seed=int(cfg.get("seed", 1)),
                )
            )
        else:
            raise ValueError(f"unknown dataset {name!r}")
    return indexes


def resolve_meta_params(cfg: Dict, model, params) -> MetaParams:
    """Fresh meta-params, optionally restored from a checkpoint
    (meta_optim_model_file / resume semantics, train_meta.py:91-107)."""
    meta_cfg = cfglib.to_meta_optim_config(cfg)
    mp = init_meta_params(meta_cfg, params)
    ckpt = cfg.get("meta_optim_model_file") or cfg.get("resume")
    if ckpt and os.path.exists(ckpt):
        state, _ = load_checkpoint(ckpt, {"meta_params": mp, "opt_state": None})
        mp = state["meta_params"]
    return mp
