"""SPMD meta-training step: task-parallel meta-gradients over a device mesh.

Reference mechanism being replaced (/root/reference/src/train_meta.py:155-201,
src/util/meta_run.py:83-243; SURVEY.md §2.5): one OS process per meta-shard,
each running the inner fine-tune loop for its tasks and ``+=``-ing gradients
into shared-memory CPU tensors, with the parent polling a Manager dict,
dividing by ``meta_batch_size``, clipping, and stepping a vendored RAdam
(train_meta.py:359-373).

TPU-native design: ONE jitted SPMD program. The task batch is sharded over
the mesh's ``task`` axis with ``shard_map``; each device runs its local tasks
sequentially under ``lax.scan`` (matching the reference's per-process
sequential task loop, and keeping peak memory at one-task footprint); the
gradient all-reduce is a single ``lax.psum`` over ICI; the outer update is
optax RAdam (per-group learning rates via ``multi_transform``) fused into the
same program. No polling, no shared memory, no process boundary.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from e_osvos_tpu.data import transforms
from e_osvos_tpu.meta_optim import (
    MetaOptimConfig,
    MetaParams,
    clamp_meta_params,
    meta_grads,
)
from e_osvos_tpu.ops import losses as loss_ops
from e_osvos_tpu.parallel.mesh import TASK_AXIS

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class OuterOptimConfig:
    """Outer (meta) optimizer config. Parity: ``meta_optim_optim_cfg``
    (cfgs/meta.yaml:43-49) + the per-group RAdam construction
    (train_meta.py:110-127)."""

    model_init_lr: float = 1e-5
    log_init_lr_lr: float = 1e-5
    lr: float = 1e-3  # any future non-init meta-params
    model_init_weight_decay: float = 1e-3
    grad_clip: Optional[float] = None


@dataclasses.dataclass(frozen=True)
class MetaStepConfig:
    """Inner-loop shape of one meta step. Parity: num_epochs.train=5,
    bptt_epochs=5, batch_sizes.train (cfgs/meta.yaml:24-27,128-131)."""

    num_epochs: int = 5
    bptt_epochs: int = 5
    train_batch_size: int = 3
    loss_func: str = "dice"
    normalize_mode: str = "davis"
    # reference random_frame_transform_per_task (cfgs/meta.yaml:18, default
    # True upstream): ONE deterministic augmentation per task — the support
    # frame is warped once and reused for every inner epoch (the per-file
    # transform cache, custom_transforms.py:58-87), query frames get their
    # own per-frame warp with the flip/color draws shared task-wide, and the
    # support batch collapses to 1 (the reference's batch_sizes.train=1
    # meta default; identical replicas are mathematically redundant for
    # every loss up to the dice smoothing constant). False = this
    # framework's richer mode: fresh independent augmentations per replica
    # and per inner step, un-augmented queries.
    frame_transform_per_task: bool = False
    # remat the inner steps (jax.checkpoint) — required for 480p BPTT memory,
    # off for small-shape tests where compile time dominates
    remat: bool = True
    augment: transforms.AugmentConfig = dataclasses.field(
        default_factory=transforms.AugmentConfig
    )
    # detection-family task randomization: permute the box-regression target
    # coordinates with a per-task random permutation (reference
    # random_box_coord_perm, cfgs/meta.yaml:103 → meta_tasksets.py:148-153;
    # its loss-side consumption is commented out upstream — here it is live)
    random_box_coord_perm: bool = False


def make_outer_optimizer(
    cfg: OuterOptimConfig, meta_params: MetaParams
) -> optax.GradientTransformation:
    """Per-group RAdam over the meta-parameters.

    The reference builds three RAdam param groups with distinct lrs and
    weight decay on the learned init (train_meta.py:110-127, radam.py:12-92);
    optax expresses the same as ``multi_transform`` over labeled subtrees.
    Elementwise gradient clipping (train_meta.py:361-366 ``clamp_``) becomes
    ``optax.clip`` at the chain head.
    """

    def group(lr: float, weight_decay: float = 0.0):
        chain = []
        if cfg.grad_clip is not None:
            chain.append(optax.clip(cfg.grad_clip))
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        chain.append(optax.radam(lr))
        return optax.chain(*chain)

    labels = MetaParams(
        model_init=jax.tree_util.tree_map(lambda _: "model_init", meta_params.model_init),
        log_init_lr=jax.tree_util.tree_map(lambda _: "log_init_lr", meta_params.log_init_lr),
    )
    return optax.multi_transform(
        {
            "model_init": group(cfg.model_init_lr, cfg.model_init_weight_decay),
            "log_init_lr": group(cfg.log_init_lr_lr),
        },
        labels,
    )


class MetaStepOut(NamedTuple):
    meta_params: MetaParams
    opt_state: Any
    meta_loss: Array  # scalar mean over the meta batch
    per_task_loss: Array  # [B]
    train_losses: Array  # [B, num_epochs] inner-loop train losses


def detection_task_fns(model, cfg: MetaStepConfig):
    """(train_loss_fn, query_loss_fn) for meta-training the DETECTION model
    family (Mask R-CNN, the reference's default architecture,
    cfgs/meta.yaml:70): the inner/query losses are the detector's summed
    loss dict over mask targets synthesized in-forward (mask_rcnn.py:582-731).
    Pass via ``make_meta_step(..., task_fns=detection_task_fns(model, cfg))``.
    """

    def _detection_loss(params, key, imgs, labels, perm):
        imgs = transforms.normalize(imgs, cfg.normalize_mode)
        masks = jnp.where(labels == 255, 255.0, labels.astype(jnp.float32))
        gt_masks = masks[:, None]  # one object group per task
        gt_valid = jnp.any(gt_masks == 1, axis=(2, 3))
        total, _ = model.apply(
            params, imgs, gt_masks, gt_valid, train=True,
            box_coord_perm=perm, rngs={"sample": key},
        )
        return total

    def train_loss_fn(params, batch):
        key, img, label, perm = batch
        k_aug, k_s = jax.random.split(key)
        imgs, labels = transforms.augment_support_batch(
            k_aug, img, label, cfg.train_batch_size, cfg.augment
        )
        return _detection_loss(params, k_s, imgs, labels, perm)

    def query_loss_fn(params, batch):
        # per-task key (folded from the task seed) so ROI sampling varies
        # across tasks, matching the reference's per-task query sampling
        # (meta_run.py:192-207); round 1 used a constant PRNGKey(0)
        key, imgs, labels, perm = batch
        return _detection_loss(
            params, key, imgs.astype(jnp.float32), labels, perm
        )

    return train_loss_fn, query_loss_fn


def _task_fns(model_apply: Callable, cfg: MetaStepConfig):
    """(train_loss_fn, query_loss_fn) for the inner loop.

    train: augmented support copies generated ON DEVICE per step (EpochSampler
    semantics, helper_func.py:521-545). query: plain forward on the meta
    frames (meta_run.py:192-207)."""

    def train_loss_fn(params, batch):
        key, img, label, _perm = batch
        imgs, labels = transforms.augment_support_batch(
            key, img, label, cfg.train_batch_size, cfg.augment
        )
        imgs = transforms.normalize(imgs, cfg.normalize_mode)
        valid = labels != 255
        gts = jnp.where(valid, labels, 0).astype(jnp.float32)
        logits = model_apply(params, imgs)[..., 0]
        return loss_ops.compute_loss(cfg.loss_func, logits, gts, valid)

    def query_loss_fn(params, batch):
        _key, imgs, labels, _perm = batch
        imgs = transforms.normalize(imgs, cfg.normalize_mode)
        valid = labels != 255
        gts = jnp.where(valid, labels, 0).astype(jnp.float32)
        logits = model_apply(params, imgs)[..., 0]
        return loss_ops.compute_loss(cfg.loss_func, logits, gts, valid)

    return train_loss_fn, query_loss_fn


def make_meta_step(
    model_apply: Callable,
    meta_cfg: MetaOptimConfig,
    step_cfg: MetaStepConfig,
    outer_cfg: OuterOptimConfig,
    mesh: Mesh,
    meta_batch_size: int,
    task_fns=None,
) -> Callable[[MetaParams, Any, Any], MetaStepOut]:
    """Build the jitted SPMD meta step.

    The returned function takes (meta_params, opt_state, task_batch) where
    ``task_batch`` leaves have leading dim ``meta_batch_size`` sharded over
    the mesh ``task`` axis (mesh.shard_task_batch), and returns updated
    meta-params/opt-state plus replicated metrics.
    """
    return MetaStep(
        model_apply, meta_cfg, step_cfg, outer_cfg, mesh, meta_batch_size,
        task_fns=task_fns,
    )


class MetaStep:
    """Callable SPMD meta step with an optax outer state.

    Usage::

        step = make_meta_step(...)
        opt_state = step.init(meta_params)
        jitted = jax.jit(step)   # or call directly; shard_map handles layout
        out = jitted(meta_params, opt_state, task_batch)
    """

    def __init__(
        self,
        model_apply: Callable,
        meta_cfg: MetaOptimConfig,
        step_cfg: MetaStepConfig,
        outer_cfg: OuterOptimConfig,
        mesh: Mesh,
        meta_batch_size: int,
        task_fns=None,
    ):
        n_shards = mesh.shape[TASK_AXIS]
        if meta_batch_size % n_shards != 0:
            raise ValueError(
                f"meta_batch_size {meta_batch_size} not divisible by task-axis "
                f"size {n_shards} (parity: train_meta.py:150 divisibility assert)"
            )
        self.meta_cfg = meta_cfg
        self.step_cfg = step_cfg
        self.outer_cfg = outer_cfg
        self.mesh = mesh
        self.meta_batch_size = meta_batch_size
        self._outer_tx: Optional[optax.GradientTransformation] = None
        self._jitted_step = None
        self._task_fns = task_fns
        self._build(model_apply)

    def init(self, meta_params: MetaParams):
        self._outer_tx = make_outer_optimizer(self.outer_cfg, meta_params)
        return self._outer_tx.init(meta_params)

    def _build(self, model_apply: Callable):
        meta_cfg = self.meta_cfg
        step_cfg = self.step_cfg
        mesh = self.mesh
        meta_batch_size = self.meta_batch_size
        train_loss_fn, query_loss_fn = (
            self._task_fns
            if self._task_fns is not None
            else _task_fns(model_apply, step_cfg)
        )

        def task_grads(meta_params: MetaParams, task):
            s_img, s_label, q_imgs, q_labels, seed = task
            key = jax.random.PRNGKey(seed)
            q_key = jax.random.fold_in(key, 0x71)  # per-task query-pass key
            keys = jax.random.split(key, step_cfg.num_epochs)
            # one random box-coordinate permutation per task, shared by every
            # inner step and the query pass (meta_tasksets.py:148-153)
            if step_cfg.random_box_coord_perm:
                perm = jax.random.permutation(
                    jax.random.fold_in(key, 0x42), 4
                ).astype(jnp.int32)
            else:
                perm = jnp.arange(4, dtype=jnp.int32)
            if step_cfg.frame_transform_per_task:
                # one augmentation per task (support reused every epoch,
                # queries augmented with shared flip/color): the inner train
                # fn sees PRE-augmented [1,H,W,*] batches, so it is the
                # query fn (normalize + loss, no augmentation)
                a_img, a_label, aq_imgs, aq_labels = transforms.augment_task_frames(
                    jax.random.fold_in(key, 0x7A),
                    s_img.astype(jnp.float32),
                    s_label,
                    q_imgs.astype(jnp.float32),
                    q_labels,
                    step_cfg.augment,
                )
                sup_imgs = a_img[None]
                sup_labels = a_label[None].astype(jnp.int32)
                train_batches = (
                    keys,
                    jnp.broadcast_to(
                        sup_imgs, (step_cfg.num_epochs,) + sup_imgs.shape
                    ),
                    jnp.broadcast_to(
                        sup_labels, (step_cfg.num_epochs,) + sup_labels.shape
                    ),
                    jnp.broadcast_to(perm, (step_cfg.num_epochs, 4)),
                )
                inner_train_fn = query_loss_fn
                query_batch = (q_key, aq_imgs, aq_labels.astype(jnp.int32), perm)
            else:
                train_batches = (
                    keys,
                    jnp.broadcast_to(s_img, (step_cfg.num_epochs,) + s_img.shape),
                    jnp.broadcast_to(s_label, (step_cfg.num_epochs,) + s_label.shape),
                    jnp.broadcast_to(perm, (step_cfg.num_epochs, 4)),
                )
                inner_train_fn = train_loss_fn
                query_batch = (q_key, q_imgs, q_labels, perm)
            loss, grads, tr_losses = meta_grads(
                meta_cfg,
                inner_train_fn,
                query_loss_fn,
                meta_params,
                train_batches,
                query_batch,
                bptt_epochs=step_cfg.bptt_epochs,
                remat=step_cfg.remat,
            )
            return loss, grads, tr_losses

        def local_shard(meta_params: MetaParams, batch):
            """Runs on each task shard: sequential scan over local tasks,
            psum-all-reduce of the gradient sum (the shared-memory ``+=`` +
            divide of train_meta.py:361-366, now on ICI)."""

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, meta_params)

            def body(carry, task):
                loss_sum, grad_sum = carry
                loss, grads, tr_losses = task_grads(meta_params, task)
                grad_sum = jax.tree_util.tree_map(jnp.add, grad_sum, grads)
                return (loss_sum + loss, grad_sum), (loss, tr_losses)

            (loss_sum, grad_sum), (local_losses, local_tr) = jax.lax.scan(
                body, (jnp.asarray(0.0, jnp.float32), zero_grads), batch
            )
            loss_sum = jax.lax.psum(loss_sum, TASK_AXIS)
            grad_sum = jax.lax.psum(grad_sum, TASK_AXIS)
            all_losses = jax.lax.all_gather(local_losses, TASK_AXIS, tiled=True)
            all_tr = jax.lax.all_gather(local_tr, TASK_AXIS, tiled=True)
            inv_b = 1.0 / meta_batch_size
            grads = jax.tree_util.tree_map(lambda g: g * inv_b, grad_sum)
            return loss_sum * inv_b, grads, all_losses, all_tr

        batch_spec = (P(TASK_AXIS),) * 5

        self._sharded_grads = shard_map(
            local_shard,
            mesh=mesh,
            in_specs=(P(), batch_spec),
            out_specs=(P(), P(), P(), P()),
            # scan carries inside the per-shard task loop mix replicated
            # meta-params with task-varying batches; skip the
            # varying-manual-axes check rather than pvary-annotating every
            # carry in the meta_optim internals
            check_vma=False,
        )

    def _step_impl(self, meta_params: MetaParams, opt_state, batch) -> MetaStepOut:
        mean_loss, grads, per_task, train_losses = self._sharded_grads(
            meta_params, batch
        )
        updates, opt_state = self._outer_tx.update(grads, opt_state, meta_params)
        meta_params = optax.apply_updates(meta_params, updates)
        meta_params = clamp_meta_params(self.meta_cfg, meta_params)
        return MetaStepOut(
            meta_params=meta_params,
            opt_state=opt_state,
            meta_loss=mean_loss,
            per_task_loss=per_task,
            train_losses=train_losses,
        )

    def __call__(self, meta_params: MetaParams, opt_state, task_batch) -> MetaStepOut:
        if self._outer_tx is None:
            raise RuntimeError("call .init(meta_params) before stepping")
        if self._jitted_step is None:
            # the WHOLE step (sharded grads + outer RAdam + clamp) must be
            # one jitted program: an eager outer update dispatches thousands
            # of per-leaf ops, which is catastrophic over a remote runtime
            self._jitted_step = jax.jit(self._step_impl)
        batch = (
            task_batch.support_img.astype(jnp.float32),
            task_batch.support_label.astype(jnp.int32),
            task_batch.query_imgs.astype(jnp.float32),
            task_batch.query_labels.astype(jnp.int32),
            task_batch.seeds.astype(jnp.uint32),
        )
        return self._jitted_step(meta_params, opt_state, batch)
