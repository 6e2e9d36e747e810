"""Learning-rate pytrees for the learned optimizer.

The reference's MetaOptimizer holds learnable log learning rates at one of
four granularities — SINGLE / TENSOR / NEURON / PARAM
(/root/reference/src/meta_optim/meta_optim.py:28-69) — stored as torch
Parameters with shapes broadcastable against each model parameter, plus
clamping utilities (meta_optim.py:116-133) and lr statistics for
visualization (meta_optim.py:83-107).

Here the learning rates are simply a pytree mirroring the model parameter
pytree, with leaf shapes chosen per granularity so a plain broadcastd
multiply applies them.  Flax convention puts the output-feature axis LAST
(HWIO conv kernels, (in, out) dense kernels), so "neuron" granularity keeps
the last axis and collapses the rest — the transpose of the reference's
torch OIHW dim-0 convention, same semantics: one lr per output neuron.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

Array = jax.Array

# log-lr floor used by the reference when clamping in log space
# (meta_optim.py:116-133 clamps lrs into [e^-33, max_lr]).
LOG_LR_MIN = -33.0

HIERARCHY_LEVELS = ("single", "tensor", "neuron", "param")


def _lr_shape(level: str, shape: tuple) -> tuple:
    if level == "tensor" or len(shape) == 0:
        return ()
    if level == "neuron":
        # one lr per output feature (last axis in flax layouts), broadcast
        # over the remaining axes
        return (1,) * (len(shape) - 1) + (shape[-1],)
    if level == "param":
        return shape
    raise ValueError(f"unknown lr hierarchy level {level!r}")


def init_lr_tree(
    params: Any,
    hierarchy_level: str = "neuron",
    init_lr: float = 1e-3,
    use_log: bool = True,
) -> Any:
    """Build the learnable lr pytree for ``params``.

    Parity: MetaOptimizer.__init__ lr construction (meta_optim.py:28-69).
    ``single`` returns one scalar leaf shared across the whole tree (stored
    as a 0-d array at tree root is awkward in JAX, so we store a scalar per
    leaf that callers must tie; in practice the reference never uses SINGLE
    — NEURON is the published configuration, cfgs/meta.yaml:37).
    """
    if hierarchy_level not in HIERARCHY_LEVELS:
        raise ValueError(f"unknown lr hierarchy level {hierarchy_level!r}")
    value = math.log(init_lr) if use_log else init_lr
    level = "tensor" if hierarchy_level == "single" else hierarchy_level

    def leaf_lr(p):
        return jnp.full(_lr_shape(level, jnp.shape(p)), value, jnp.float32)

    return jax.tree_util.tree_map(leaf_lr, params)


def materialize_lrs(lr_tree: Any, use_log: bool = True) -> Any:
    """log-lrs → positive lrs (exp), or identity when linear-space."""
    if not use_log:
        return lr_tree
    return jax.tree_util.tree_map(jnp.exp, lr_tree)


def clamp_lr_tree(
    lr_tree: Any,
    use_log: bool = True,
    max_lr: float = 1.0,
    allow_zero: bool = False,
) -> Any:
    """Clamp lrs into a sane range after each outer-optimizer step.

    Parity: clamp_init_lr (meta_optim.py:116-133): log-space lrs are clamped
    to [e^-33, max_lr]; linear-space lrs to [0, max_lr] (or e^-33 floor when
    zero lrs are disallowed).
    """
    if use_log:
        lo = LOG_LR_MIN
        hi = math.log(max_lr)
        return jax.tree_util.tree_map(lambda x: jnp.clip(x, lo, hi), lr_tree)
    lo = 0.0 if allow_zero else math.exp(LOG_LR_MIN)
    return jax.tree_util.tree_map(lambda x: jnp.clip(x, lo, max_lr), lr_tree)


def mask_lrs_by_path(
    lrs: Any, substrings, keep_matching: bool = True, zero_value: float = 0.0
) -> Any:
    """Zero the (materialized) lrs of every leaf whose tree path does / does
    not contain one of ``substrings`` — the reference's partial-update
    switches expressed as lr masking:

      * ``only_box_head`` online-adaptation mode updates only the roi/box
        head (meta_optim.py:209-210): ``mask_lrs_by_path(lrs, ['box_head',
        'roi'], keep_matching=True)``;
      * encoder freezing (meta_optim_optim_cfg.freeze_encoder,
        train_meta.py:110-127): ``keep_matching=False`` with backbone paths.

    A zero lr makes the inner SGD step a no-op for that leaf while keeping
    every shape static (no parameter partitioning needed under jit).
    ``zero_value``: use ``LOG_LR_MIN`` when the tree stores LOG lrs (e^-33
    ≈ 0, the reference's log-space floor).
    """
    subs = tuple(substrings)

    def visit(path, leaf):
        name = jax.tree_util.keystr(path).lower()
        hit = any(s.lower() in name for s in subs)
        keep = hit if keep_matching else not hit
        return leaf if keep else jnp.full_like(leaf, zero_value)

    return jax.tree_util.tree_map_with_path(visit, lrs)


def lr_stats(lr_tree: Any, use_log: bool = True) -> Dict[str, Array]:
    """Mean/std/min/max of the materialized lrs — the numbers the reference
    plots as init-lr statistics (meta_optim.py:83-107, visualize.py:99-118)."""
    lrs = materialize_lrs(lr_tree, use_log)
    flat = jnp.concatenate(
        [jnp.ravel(x) for x in jax.tree_util.tree_leaves(lrs)]
    )
    return {
        "mean": jnp.mean(flat),
        "std": jnp.std(flat),
        "min": jnp.min(flat),
        "max": jnp.max(flat),
    }


def lr_per_tensor(lr_tree: Any, use_log: bool = True) -> Dict[str, float]:
    """Mean materialized lr per parameter tensor, keyed by '/'-joined tree
    path — the reference's per-tensor init-lr curves (visualize.py:107-118,
    one Visdom legend entry per named parameter)."""
    lrs = materialize_lrs(lr_tree, use_log)
    flat = {}

    def visit(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                visit(v, f"{prefix}/{k}" if prefix else str(k))
        else:
            flat[prefix] = float(jnp.mean(node))

    visit(lrs, "")
    return flat
