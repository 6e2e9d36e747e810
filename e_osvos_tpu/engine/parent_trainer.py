"""Parent (pre-)training: supervised training of the segmentation network
before meta-training.

Reference behavior (/root/reference/src/train_parent.py:1-378, bit-rotted as
committed — SURVEY.md §2.1 notes the undefined ``PathAbstract`` crash): train
the network on YouTube-VOS / DAVIS (or VOC) frames with Adam/SGD, random
scale/rotate/flip/color augmentation, periodic J/F eval on a val split,
epoch snapshots. This rebuild runs the whole step (augment → forward →
loss → grad → update) as ONE jitted SPMD program with the frame batch
sharded over the mesh ``task`` axis and gradients psum-reduced — the
reference was single-GPU only.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from e_osvos_tpu.data import transforms
from e_osvos_tpu.data.datasets import binarize_label
from e_osvos_tpu.ops import losses as loss_ops
from e_osvos_tpu.parallel.mesh import TASK_AXIS, make_mesh, task_sharding
from e_osvos_tpu.utils import MetricsLogger, Timer, save_checkpoint


@dataclasses.dataclass
class ParentTrainConfig:
    num_iters: int = 10000
    batch_size: int = 8
    lr: float = 1e-4
    weight_decay: float = 0.0
    optimizer: str = "adam"  # [adam, sgd] (train_parent.py:189)
    momentum: float = 0.9
    loss_func: str = "cross_entropy_and_dice"
    crop_size: tuple = (480, 480)
    normalize_mode: str = "davis"
    log_interval: int = 50
    snapshot_interval: int = 1000
    save_dir: Optional[str] = None
    seed: int = 0
    augment: transforms.AugmentConfig = dataclasses.field(
        default_factory=transforms.AugmentConfig
    )
    # "dense" = binary fg/bg segmentation (the reference's train_parent
    # task); "detection" = supervised Mask R-CNN training on instance
    # masks — the in-framework analog of the COCO pre-training the
    # reference gets for free from torchvision (helper_func.py:339-346
    # loads maskrcnn_resnet50_fpn(pretrained=True)); with no COCO in this
    # environment, a detection parent must be trainable from scratch.
    task: str = "dense"
    max_objects: int = 3  # detection: instance slots per frame


class FrameSampler:
    """Host-side random (frame, all-objects-binary-label) sampler over one
    or more dataset indexes — the parent task is binary fg/bg segmentation
    of all annotated objects (train_parent.py dataset setup)."""

    def __init__(self, indexes: Sequence, crop_size, seed: int = 0):
        self.indexes = list(indexes)
        self.crop = crop_size
        self.rng = np.random.RandomState(seed)
        self.units = []
        for ii, index in enumerate(self.indexes):
            for name, seq in index.sequences.items():
                for t in range(len(seq)):
                    if seq.label_paths[t] is not None:
                        self.units.append((ii, name, t))
        if not self.units:
            raise ValueError("no annotated frames")

    def sample_batch(self, n: int):
        th, tw = self.crop
        imgs = np.zeros((n, th, tw, 3), np.float32)
        labels = np.full((n, th, tw), 255, np.int32)
        for i in range(n):
            ii, name, t = self.units[self.rng.randint(len(self.units))]
            index = self.indexes[ii]
            img = index.get_image(name, t).astype(np.float32)
            gt = index.get_label(name, t)
            ids = [k for k in np.unique(gt) if k not in (0, 255)]
            label = binarize_label(gt, ids).astype(np.int32)
            h, w = img.shape[:2]
            if h < th or w < tw:
                img = np.pad(img, ((0, max(th - h, 0)), (0, max(tw - w, 0)), (0, 0)))
                label = np.pad(label, ((0, max(th - h, 0)), (0, max(tw - w, 0))),
                               constant_values=255)
                h, w = img.shape[:2]
            y0 = self.rng.randint(0, h - th + 1)
            x0 = self.rng.randint(0, w - tw + 1)
            imgs[i] = img[y0 : y0 + th, x0 : x0 + tw]
            labels[i] = label[y0 : y0 + th, x0 : x0 + tw]
        seeds = self.rng.randint(0, 2**31 - 1, size=(n,)).astype(np.uint32)
        return imgs, labels, seeds


class InstanceFrameSampler(FrameSampler):
    """Detection-parent variant: labels keep per-instance ids (1..K),
    remapped per frame; instances beyond ``max_objects`` become 255-ignore
    so they never count as background."""

    def __init__(self, indexes: Sequence, crop_size, max_objects: int = 3,
                 seed: int = 0):
        super().__init__(indexes, crop_size, seed=seed)
        self.max_objects = max_objects

    def sample_batch(self, n: int):
        th, tw = self.crop
        imgs = np.zeros((n, th, tw, 3), np.float32)
        labels = np.full((n, th, tw), 255, np.int32)
        for i in range(n):
            ii, name, t = self.units[self.rng.randint(len(self.units))]
            index = self.indexes[ii]
            img = index.get_image(name, t).astype(np.float32)
            gt = index.get_label(name, t).astype(np.int32)
            ids = [k for k in np.unique(gt) if k not in (0, 255)]
            label = np.where(gt == 255, 255, 0).astype(np.int32)
            for slot, k in enumerate(ids, start=1):
                label[gt == k] = slot if slot <= self.max_objects else 255
            h, w = img.shape[:2]
            if h < th or w < tw:
                img = np.pad(img, ((0, max(th - h, 0)), (0, max(tw - w, 0)), (0, 0)))
                label = np.pad(label, ((0, max(th - h, 0)), (0, max(tw - w, 0))),
                               constant_values=255)
                h, w = img.shape[:2]
            y0 = self.rng.randint(0, h - th + 1)
            x0 = self.rng.randint(0, w - tw + 1)
            imgs[i] = img[y0 : y0 + th, x0 : x0 + tw]
            labels[i] = label[y0 : y0 + th, x0 : x0 + tw]
        seeds = self.rng.randint(0, 2**31 - 1, size=(n,)).astype(np.uint32)
        return imgs, labels, seeds


class ParentTrainer:
    """SPMD supervised trainer for the segmentation network."""

    def __init__(
        self,
        model_apply: Callable,
        params: Any,
        sampler: FrameSampler,
        cfg: ParentTrainConfig = ParentTrainConfig(),
        mesh=None,
        logger: Optional[MetricsLogger] = None,
    ):
        self.cfg = cfg
        self.sampler = sampler
        self.mesh = mesh if mesh is not None else make_mesh()
        self.logger = logger or MetricsLogger(
            path=f"{cfg.save_dir}/parent_metrics.jsonl" if cfg.save_dir else None
        )
        self.params = params
        if cfg.optimizer == "adam":
            tx = optax.adam(cfg.lr)
        elif cfg.optimizer == "sgd":
            tx = optax.sgd(cfg.lr, momentum=cfg.momentum)
        else:
            raise ValueError(cfg.optimizer)
        if cfg.weight_decay:
            tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay), tx)
        self.tx = tx
        self.opt_state = tx.init(params)
        self.step_num = 0
        self.timer = Timer()

        n_shards = self.mesh.shape[TASK_AXIS]
        if cfg.batch_size % n_shards != 0:
            raise ValueError(
                f"batch_size {cfg.batch_size} not divisible by mesh task axis "
                f"{n_shards}"
            )

        def _augment(imgs, labels, seeds):
            def aug_one(seed, img, label):
                key = jax.random.PRNGKey(seed)
                return transforms.augment_frame(key, img, label, cfg.augment)

            imgs, labels = jax.vmap(aug_one)(seeds, imgs, labels)
            return transforms.normalize(imgs, cfg.normalize_mode), labels

        if cfg.task == "detection":
            def loss_fn(params, imgs, labels, seeds):
                imgs, labels = _augment(imgs, labels, seeds)
                # id-label [B,H,W] -> per-object binary masks [B,O,H,W]
                # with warp-border 255-ignore propagated to every slot
                oid = jnp.arange(1, cfg.max_objects + 1)[None, :, None, None]
                lab = labels[:, None]
                gt_masks = jnp.where(
                    lab == 255, 255.0, (lab == oid).astype(jnp.float32)
                )
                gt_valid = jnp.any(gt_masks == 1.0, axis=(2, 3))
                k_sample = jax.random.fold_in(
                    jax.random.PRNGKey(cfg.seed), seeds[0]
                )
                total, _ = model_apply(
                    params, imgs, gt_masks, gt_valid, train=True,
                    rngs={"sample": k_sample},
                )
                return total
        else:
            def loss_fn(params, imgs, labels, seeds):
                imgs, labels = _augment(imgs, labels, seeds)
                valid = labels != 255
                gts = jnp.where(valid, labels, 0).astype(jnp.float32)
                logits = model_apply(params, imgs)[..., 0]
                return loss_ops.compute_loss(cfg.loss_func, logits, gts, valid)

        def local_step(params, opt_state, imgs, labels, seeds):
            loss, grads = jax.value_and_grad(loss_fn)(params, imgs, labels, seeds)
            loss = jax.lax.pmean(loss, TASK_AXIS)
            grads = jax.lax.pmean(grads, TASK_AXIS)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._step = jax.jit(
            shard_map(
                local_step,
                mesh=self.mesh,
                in_specs=(P(), P(), P(TASK_AXIS), P(TASK_AXIS), P(TASK_AXIS)),
                out_specs=(P(), P(), P()),
                check_vma=False,
            )
        )

    def run(self, num_iters: Optional[int] = None) -> Dict[str, float]:
        """Pipelined host loop (same shape as MetaTrainer.run): step k's
        loss is fetched only after step k+1 has been dispatched, so host
        batch sampling and upload overlap device compute (1-deep pipeline,
        ≤2 steps in flight); logging/snapshot iterations flush so logged
        values are exact for their own step."""
        cfg = self.cfg
        n = num_iters if num_iters is not None else cfg.num_iters
        sh = task_sharding(self.mesh)
        last = {}
        pending = None  # (step_num, loss_handle, dispatch_t0)

        def finalize(p) -> Dict[str, float]:
            _, loss, t0 = p
            return {"loss": float(jax.device_get(loss)),
                    "step_s": time.perf_counter() - t0}

        for _ in range(n):
            imgs, labels, seeds = self.sampler.sample_batch(cfg.batch_size)
            imgs, labels, seeds = (
                jax.device_put(imgs, sh),
                jax.device_put(labels, sh),
                jax.device_put(seeds, sh),
            )
            t0 = time.perf_counter()
            self.params, self.opt_state, loss = self._step(
                self.params, self.opt_state, imgs, labels, seeds
            )
            self.step_num += 1
            if pending is not None:
                last = finalize(pending)
            pending = (self.step_num, loss, t0)

            log_now = (self.step_num % cfg.log_interval == 0
                       or self.step_num == 1)
            snap_now = (cfg.save_dir
                        and self.step_num % cfg.snapshot_interval == 0)
            if log_now or snap_now:
                last = finalize(pending)
                pending = None
            if log_now:
                self.logger.log("parent_train", step=self.step_num, **last)
            if snap_now:
                save_checkpoint(
                    f"{cfg.save_dir}/parent_{self.step_num}.ckpt",
                    self.params,
                    metadata={"step": self.step_num},
                )
        if pending is not None:
            last = finalize(pending)
        return last
