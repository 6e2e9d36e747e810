"""Shared CLI plumbing: config → model / datasets / meta-params.

Rebuilds the reference's init_parent_model + data_loaders wiring
(/root/reference/src/util/helper_func.py:250-385) on top of the dict config
tree (e_osvos_tpu/config.py)."""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

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

    def norm(key: str, default: str) -> str:
        """Resolve a norm name, auto-selecting the pure-XLA GroupNorm
        variant when second-order meta-gradients are configured: the Pallas
        custom_vjp supports one reverse-mode level only, so 'group*' would
        fail at trace time under a second jax.grad (models/resnet.py
        make_norm; scripts/validate_second_order.py)."""
        name = str(pm.get(key, default))
        so = cfg.get("meta_optim_cfg", {}).get("second_order_gradients")
        if so and name in ("group", "group16", "group4"):
            name = name + "_xla"
        return name

    kwargs: Dict[str, Any] = {"dtype": dtype}
    if arch in ("DeepLabV3", "DeepLabV3Plus"):
        kwargs.update(
            arch=pm.get("encoder", "resnet50"),
            backbone_norm=norm("backbone_norm", "group"),
            head_norm=norm("decoder_norm_layer", "group16"),
            output_stride=int(pm.get("output_stride", 8)),
            num_classes=1,
        )
    elif arch == "MaskRCNN":
        import dataclasses as _dc

        from e_osvos_tpu.models import RoIConfig, RPNConfig

        roi_sizes = pm.get("roi_pool_output_sizes", {})
        roi_kwargs = dict(
            box_roi_size=int(roi_sizes.get("box", 7)),
            nms_thresh=float(pm.get("box_nms_thresh", 0.5)),
            mask_loss=str(pm.get("maskrcnn_loss", "LOVASZ")).lower(),
            detections_per_img=int(pm.get("detections_per_img", 1)),
        )
        if roi_sizes.get("mask") is not None:
            roi_kwargs["mask_out_size"] = int(roi_sizes["mask"])
        # rebuild extension (no reference YAML equivalent — torchvision
        # hard-codes these): parent_model.{rpn,roi} subtrees override any
        # RPNConfig/RoIConfig field, e.g. anchor_sizes/pre_nms_top_n for
        # small-resolution runs and tests
        rpn_over = dict(pm.get("rpn", {}) or {})
        roi_over = dict(pm.get("roi", {}) or {})
        for fields, over in ((RPNConfig, rpn_over), (RoIConfig, roi_over)):
            valid = {f.name for f in _dc.fields(fields)}
            unknown = set(over) - valid
            if unknown:
                raise KeyError(f"unknown {fields.__name__} keys: {unknown}")
        for k, v in rpn_over.items():
            rpn_over[k] = tuple(v) if isinstance(v, list) else v
        roi_kwargs.update(
            {k: tuple(v) if isinstance(v, list) else v
             for k, v in roi_over.items()}
        )
        kwargs.update(
            arch=pm.get("encoder", "resnet50"),
            backbone_norm=norm("backbone_norm", "group"),
            rpn=RPNConfig(**rpn_over),
            roi=RoIConfig(**roi_kwargs),
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
        elif name == "VOC2012":
            # parent pre-training alternative (pascal_voc.py; binary fg/bg);
            # pair with the VOC2012 named config for the reference's
            # flip/scale-crop/blur augmentation stack
            from e_osvos_tpu.data.voc import VOC2012Index

            indexes.append(
                VOC2012Index(
                    root, split=split or "train",
                    void=str(cfg.get("voc", {}).get("void", "background")),
                )
            )
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


class ParentStateSelector:
    """Leave-one-out parent-model selection (parity: load_state_dict,
    helper_func.py:483-496 + the parent_model.<role>.{paths,val_split_files}
    config schema, reference cfgs/meta.yaml:85-96): multiple parent
    checkpoints, each pre-trained with a different val split held out; for
    an eval sequence, pick the state whose *val* split contains it — so the
    parent never trained on the sequence being evaluated."""

    def __init__(self, states, splits):
        if len(states) != len(splits):
            raise ValueError(
                f"{len(states)} parent states vs {len(splits)} val splits"
            )
        self.states = list(states)
        self.splits = [list(s) for s in splits]

    def select(self, seq_name: str):
        """Params for ``seq_name``; single-state selectors are unconditional."""
        if len(self.states) == 1 and not self.splits[0]:
            return self.states[0]
        for state, split in zip(self.states, self.splits):
            if seq_name in split:
                return state
        raise KeyError(
            f"no parent model with {seq_name!r} in its val_split_file"
        )


def _load_parent_state(path: str, params_template):
    """One parent checkpoint → flax variables. ``.pth``/``.pt`` files go
    through the torch importer (models/torch_import.py); everything else is
    a native msgpack checkpoint."""
    if path.endswith((".pth", ".pt", ".model")):
        from e_osvos_tpu.models.torch_import import (
            detect_torch_architecture,
            load_mapped_from_torch,
            load_torch_file,
            shape_matched_load,
        )

        sd = load_torch_file(path)
        # name-mapped import when the key vocabulary identifies a reference
        # model family (exact per-tensor routing incl. fc6 CHW→HWC reorder
        # and BN-stat folding); shape-matched copy otherwise — the
        # reference's own surgery rule (mask_rcnn.py:467-475)
        if detect_torch_architecture(sd) != "unknown":
            state, _copied = load_mapped_from_torch(params_template, sd)
        else:
            state, _copied = shape_matched_load(params_template, sd)
        return state
    state, _ = load_checkpoint(path, params_template)
    return state


def build_parent_state_selector(
    cfg: Dict, role: str, params_template
) -> Optional[ParentStateSelector]:
    """ParentStateSelector from ``parent_model.<role>`` (None when no paths
    are configured — then the caller's single init is used for every
    sequence)."""
    pm = cfg.get("parent_model", {}).get(role, {})
    paths = pm.get("paths") or []
    if not paths:
        return None
    split_files = pm.get("val_split_files") or []
    states = [_load_parent_state(p, params_template) for p in paths]
    splits = []
    for p in split_files:
        from e_osvos_tpu.data.datasets import read_split_file

        splits.append(read_split_file(p))
    while len(splits) < len(states):
        splits.append([])
    return ParentStateSelector(states, splits)


def resolve_meta_params(cfg: Dict, model, params) -> MetaParams:
    """Fresh meta-params, optionally restored from a checkpoint
    (meta_optim_model_file / resume semantics, train_meta.py:91-107)."""
    meta_cfg = cfglib.to_meta_optim_config(cfg)
    mp = init_meta_params(meta_cfg, params)
    explicit = cfg.get("meta_optim_model_file")
    if explicit and not os.path.exists(explicit):
        # an explicitly named meta checkpoint must exist — silently falling
        # back to the random init would fake an eval result. (`resume` stays
        # lenient: a fresh run legitimately has no last_meta_iter.ckpt yet.)
        raise FileNotFoundError(f"meta_optim_model_file: {explicit!r}")
    ckpt = explicit or cfg.get("resume")
    if ckpt and os.path.exists(ckpt):
        if ckpt.endswith((".model", ".pth", ".pt")):
            # reference meta checkpoint: learned init + per-neuron log lrs
            # under mangled names (train_meta.py:278-286, meta_optim.py:46-78)
            from e_osvos_tpu.models.torch_import import (
                import_meta_checkpoint_from_torch,
                load_torch_file,
            )

            mp, _ic, _lc = import_meta_checkpoint_from_torch(
                mp, load_torch_file(ckpt)
            )
        else:
            state, _ = load_checkpoint(
                ckpt, {"meta_params": mp, "opt_state": None}
            )
            mp = state["meta_params"]
    return mp
