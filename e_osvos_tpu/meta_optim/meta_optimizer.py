"""The learned optimizer core, TPU-native.

Reference semantics being rebuilt (no code shared):
  * MetaOptimizer: learnable per-neuron log learning rates + (optionally)
    the model initialization itself as meta-parameters; ``step(train_loss)``
    = functional SGD with the learned lrs, optionally keeping the graph for
    second-order meta-gradients (/root/reference/src/meta_optim/
    meta_optim.py:10-215).
  * MetaModel: parameter-swapping shim that fakes functional parameters in
    PyTorch (meta_model.py:5-114). In JAX parameters ARE functional pytrees,
    so the entire class disappears — the inner update is one ``tree_map``.
  * The inner fine-tune loop (meta_run.py:124-224, evaluate.py:220-280)
    becomes ONE jitted ``lax.scan`` over steps: the whole one-shot
    adaptation is a single XLA program. Early stopping (helper_func.py:
    388-397) becomes a masked carry instead of a Python ``break``.
  * Truncated BPTT (meta_run.py:189-217): the reference accumulates a meta
    loss on query frames every ``bptt_epochs`` inner steps and detaches the
    graph. Here ``meta_loss`` applies ``stop_gradient`` to the carried
    params at segment boundaries — one ``jax.grad`` then yields exactly the
    truncated meta-gradients (learned init receives gradient only through
    the first segment, lrs through every segment, matching the reference's
    ``reset(keep_state=True)`` detach).
  * First- vs second-order gradients (meta_optim.py:185-204,
    cfgs/meta.yaml:40): first-order = ``stop_gradient`` on the inner grads,
    so meta-gradients flow only through the linear ``p - lr*g`` update.

TPU-first notes: inner steps run under ``jax.checkpoint`` (remat) so a
5-step BPTT through a 480p CNN fits HBM; all control flow is lax primitives
so everything fuses into one compiled program; donation is left to callers
(``jax.jit(..., donate_argnums=...)``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from e_osvos_tpu.meta_optim.lr_tree import (
    clamp_lr_tree,
    init_lr_tree,
    materialize_lrs,
)

Array = jax.Array
Params = Any
LossFn = Callable[[Params, Any], Array]


@dataclasses.dataclass(frozen=True)
class MetaOptimConfig:
    """Configuration mirroring the reference's ``meta_optim_cfg``
    (cfgs/meta.yaml:36-42)."""

    lr_hierarchy_level: str = "neuron"
    init_lr: float = 1e-3
    learn_model_init: bool = True
    use_log_init_lr: bool = True
    max_lr: float = 1.0
    second_order_gradients: bool = False
    # restrict second-order gradients to parameter subtrees whose path
    # contains one of these substrings (the reference limits create_graph to
    # roi_heads, mask_rcnn.py:513,536-544 + meta_optim.py:195-199); empty =
    # all parameters
    second_order_subtrees: Tuple[str, ...] = ()


class MetaParams(NamedTuple):
    """The meta-parameters the outer loop optimizes.

    ``model_init`` is None when ``learn_model_init=False`` (then fine-tuning
    starts from whatever params the caller passes at reset)."""

    model_init: Optional[Params]
    log_init_lr: Params


class FineTuneState(NamedTuple):
    """Carry of the inner fine-tune scan."""

    params: Params
    best_loss: Array  # running min of the train loss
    since_improve: Array  # int32 steps since a new min
    stopped: Array  # bool: early-stopping latch


def init_meta_params(cfg: MetaOptimConfig, params: Params) -> MetaParams:
    """Create meta-parameters from a model parameter pytree.

    Parity: MetaOptimizer.__init__ (meta_optim.py:28-78). When passed a full
    flax variables dict, non-trainable collections ('constants' frozen-BN
    stats, 'batch_stats') get zero-equivalent learning rates so the inner
    SGD never touches them (the reference's frozen-BN default,
    cfgs/meta.yaml parent_model.batch_norm.*)."""
    lrs = init_lr_tree(
        params,
        hierarchy_level=cfg.lr_hierarchy_level,
        init_lr=cfg.init_lr,
        use_log=cfg.use_log_init_lr,
    )
    if isinstance(params, dict) and any(
        k in params for k in ("constants", "batch_stats")
    ):
        from e_osvos_tpu.meta_optim.lr_tree import LOG_LR_MIN, mask_lrs_by_path

        zero = LOG_LR_MIN if cfg.use_log_init_lr else 0.0
        lrs = mask_lrs_by_path(
            lrs, ("constants", "batch_stats"), keep_matching=False,
            zero_value=zero,
        )
    init = jax.tree_util.tree_map(jnp.asarray, params) if cfg.learn_model_init else None
    return MetaParams(model_init=init, log_init_lr=lrs)


def clamp_meta_params(cfg: MetaOptimConfig, meta_params: MetaParams) -> MetaParams:
    """Post-outer-step lr clamp. Parity: clamp_init_lr (meta_optim.py:116-133)."""
    return meta_params._replace(
        log_init_lr=clamp_lr_tree(
            meta_params.log_init_lr,
            use_log=cfg.use_log_init_lr,
            max_lr=cfg.max_lr,
        )
    )


def reset_params(cfg: MetaOptimConfig, meta_params: MetaParams, params: Params) -> Params:
    """Start of an inner loop: learned init if available, else the caller's
    params. Parity: MetaOptimizer.reset (meta_optim.py:144-155)."""
    if cfg.learn_model_init and meta_params.model_init is not None:
        return meta_params.model_init
    return params


def inner_sgd_step(
    cfg: MetaOptimConfig,
    loss_fn: LossFn,
    params: Params,
    lrs: Params,
    batch: Any,
) -> Tuple[Params, Array]:
    """One learned-optimizer step: ``p ← p − lr·∇loss``.

    Parity: MetaOptimizer.step (meta_optim.py:177-212). ``lrs`` are already
    materialized (positive). First-order mode stops gradient through the
    inner grads so only the linear update is differentiated.
    """
    loss, grads = jax.value_and_grad(loss_fn)(params, batch)
    if not cfg.second_order_gradients:
        grads = jax.tree_util.tree_map(jax.lax.stop_gradient, grads)
    elif cfg.second_order_subtrees:
        # selective detach: only the named subtrees keep the inner-grad
        # graph (reference: second-order limited to roi_heads,
        # meta_optim.py:195-199 + mask_rcnn.py:536-544)
        subs = tuple(s.lower() for s in cfg.second_order_subtrees)

        def maybe_detach(path, g):
            name = jax.tree_util.keystr(path).lower()
            keep = any(s in name for s in subs)
            return g if keep else jax.lax.stop_gradient(g)

        grads = jax.tree_util.tree_map_with_path(maybe_detach, grads)
    new_params = jax.tree_util.tree_map(
        lambda p, g, lr: p - lr.astype(p.dtype) * g, params, grads, lrs
    )
    return new_params, loss


def fine_tune(
    cfg: MetaOptimConfig,
    loss_fn: LossFn,
    meta_params: MetaParams,
    batches: Any,
    init_params: Optional[Params] = None,
    early_stop_patience: int = 0,
    remat: bool = True,
    reset: bool = True,
) -> Tuple[Params, Array]:
    """The whole one-shot fine-tune as ONE ``lax.scan``.

    ``batches``: a pytree whose leaves have leading dim = num_steps (one
    batch per inner step; repeat a single support-frame batch along axis 0
    to reproduce the reference's EpochSampler semantics,
    helper_func.py:521-545).

    ``early_stop_patience`` > 0 enables the masked early-stopping latch
    (parity: helper_func.py:388-397 — stop when the train loss has not made
    a new minimum for ``patience`` steps; here later steps become no-ops
    instead of breaking the loop, so shapes stay static).

    ``reset=False`` continues from ``init_params`` unconditionally instead
    of re-binding the learned init — the online-adaptation FIRST_STEP
    continuation mode (evaluate.py:196-205).

    Returns ``(final_params, per-step train losses)`` (losses are +inf for
    steps after the stop latch, so callers can mask).
    """
    lrs = materialize_lrs(meta_params.log_init_lr, cfg.use_log_init_lr)
    params0 = reset_params(cfg, meta_params, init_params) if reset else init_params

    if early_stop_patience <= 0:
        # no early stopping → the latch can never trigger, so skip its
        # machinery entirely: the per-step `where(stopped, old, new)`
        # select over the FULL parameter tree costs ~3 HBM passes of the
        # 160 MB f32 params per step for nothing
        def plain_step(params: Params, batch):
            return inner_sgd_step(cfg, loss_fn, params, lrs, batch)

        if remat:
            plain_step = jax.checkpoint(plain_step)
        final_params, losses = jax.lax.scan(plain_step, params0, batches)
        return final_params, losses

    def step(state: FineTuneState, batch):
        new_params, loss = inner_sgd_step(cfg, loss_fn, state.params, lrs, batch)
        improved = loss < state.best_loss
        since = jnp.where(improved, 0, state.since_improve + 1)
        stopped_now = (
            (since >= early_stop_patience) if early_stop_patience > 0 else jnp.bool_(False)
        )
        stopped = jnp.logical_or(state.stopped, stopped_now)
        # once stopped, freeze params and report +inf loss for masking
        keep = state.stopped
        out_params = jax.tree_util.tree_map(
            lambda old, new: jnp.where(keep, old, new), state.params, new_params
        )
        out_loss = jnp.where(keep, jnp.inf, loss)
        new_state = FineTuneState(
            params=out_params,
            best_loss=jnp.minimum(state.best_loss, jnp.where(keep, jnp.inf, loss)),
            since_improve=jnp.where(keep, state.since_improve, since),
            stopped=stopped,
        )
        return new_state, out_loss

    if remat:
        step = jax.checkpoint(step)

    state0 = FineTuneState(
        params=params0,
        best_loss=jnp.asarray(jnp.inf, jnp.float32),
        since_improve=jnp.asarray(0, jnp.int32),
        stopped=jnp.asarray(False),
    )
    final_state, losses = jax.lax.scan(step, state0, batches)
    return final_state.params, losses


def meta_loss(
    cfg: MetaOptimConfig,
    train_loss_fn: LossFn,
    meta_loss_fn: LossFn,
    meta_params: MetaParams,
    train_batches: Any,
    meta_batch: Any,
    bptt_epochs: int = 1,
    init_params: Optional[Params] = None,
    remat: bool = True,
    segment_weights: Optional[Tuple[float, ...]] = None,
) -> Tuple[Array, Array]:
    """Truncated-BPTT meta-objective for one task.

    Runs ``num_steps = leading dim of train_batches`` inner steps; after
    every ``bptt_epochs`` steps the query loss ``meta_loss_fn(params,
    meta_batch)`` is accumulated and the carried params are detached
    (truncation). ``jax.grad`` of the returned scalar w.r.t. ``meta_params``
    gives the reference's meta-gradients (meta_run.py:133-217).

    ``segment_weights``: optional per-segment weights for the accumulated
    query losses — the reference's ``multi_step_bptt_loss`` option
    (cfgs/meta.yaml:19, e.g. [0.05, 0.10, 0.2, 0.30, 0.35]); length must
    equal the number of segments. None = uniform.

    Returns ``(total_meta_loss / num_segments, per-step train losses)``.
    """
    lrs = materialize_lrs(meta_params.log_init_lr, cfg.use_log_init_lr)
    params0 = reset_params(cfg, meta_params, init_params)

    num_steps = jax.tree_util.tree_leaves(train_batches)[0].shape[0]
    if num_steps % bptt_epochs != 0:
        raise ValueError(
            f"num inner steps ({num_steps}) must be divisible by bptt_epochs "
            f"({bptt_epochs})"
        )
    num_segments = num_steps // bptt_epochs

    def inner(params, batch):
        new_params, loss = inner_sgd_step(cfg, train_loss_fn, params, lrs, batch)
        return new_params, loss

    if remat:
        inner = jax.checkpoint(inner)

    if segment_weights is not None:
        if len(segment_weights) != num_segments:
            raise ValueError(
                f"segment_weights has {len(segment_weights)} entries for "
                f"{num_segments} segments"
            )
        weights = jnp.asarray(segment_weights, jnp.float32) * num_segments
    else:
        weights = jnp.ones((num_segments,), jnp.float32)

    def segment(carry, inp):
        w, seg_batches = inp
        params, acc = carry
        params, tr_losses = jax.lax.scan(inner, params, seg_batches)
        acc = acc + w * meta_loss_fn(params, meta_batch)
        # truncate: later segments see these params as constants
        params = jax.tree_util.tree_map(jax.lax.stop_gradient, params)
        return (params, acc), tr_losses

    seg_batches = jax.tree_util.tree_map(
        lambda x: x.reshape((num_segments, bptt_epochs) + x.shape[1:]),
        train_batches,
    )
    (final_params, total), tr_losses = jax.lax.scan(
        segment, (params0, jnp.asarray(0.0, jnp.float32)), (weights, seg_batches)
    )
    del final_params
    return total / num_segments, tr_losses.reshape(num_steps)


def meta_grads(
    cfg: MetaOptimConfig,
    train_loss_fn: LossFn,
    meta_loss_fn: LossFn,
    meta_params: MetaParams,
    train_batches: Any,
    meta_batch: Any,
    bptt_epochs: int = 1,
    init_params: Optional[Params] = None,
    remat: bool = True,
) -> Tuple[Array, MetaParams, Array]:
    """(meta_loss, d meta_loss / d meta_params, per-step train losses) for
    one task, with a NaN guard that zeroes non-finite gradients (parity: the
    reference skips a task's contribution on NaN BPTT loss,
    meta_run.py:209-226; SURVEY §5.3 recommends the finite-mask form)."""
    (loss, tr_losses), grads = jax.value_and_grad(
        lambda mp: meta_loss(
            cfg,
            train_loss_fn,
            meta_loss_fn,
            mp,
            train_batches,
            meta_batch,
            bptt_epochs=bptt_epochs,
            init_params=init_params,
            remat=remat,
        ),
        has_aux=True,
    )(meta_params)
    ok = jnp.isfinite(loss)
    grads = jax.tree_util.tree_map(
        lambda g: jnp.where(ok & jnp.isfinite(g), g, 0.0), grads
    )
    return loss, grads, tr_losses
