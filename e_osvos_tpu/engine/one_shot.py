"""One-shot fine-tune + propagate evaluation engine (the benchmark path).

Reference behavior being rebuilt (/root/reference/src/util/evaluate.py:20-439):
for every sequence × object group, reset to the learned init, fine-tune on the
support frame (augmented copies), run inference over the frame range, and —
with online adaptation enabled — re-fine-tune every ``step`` frames on the
support frame plus propagated predictions ≥ ``min_prop`` used as pseudo
ground truth (evaluate.py:141-253). Objects are merged per pixel by argmax
over per-object probability maps with a 0.5 background threshold
(evaluate.py:322-326).

TPU-native redesign (SURVEY.md §7 steps 3-4):
  * the ENTIRE fine-tune loop is one jitted ``lax.scan``; each step draws a
    fresh augmentation of the support frame ON DEVICE (transforms.py), so
    the reference's EpochSampler + DataLoader worker machinery disappears;
  * object groups are a **batch axis** (``vmap``): the reference loops
    objects serially (evaluate.py:132); batching them is the idiomatic TPU
    win — one compiled program fine-tunes all objects simultaneously;
  * online adaptation windows are a host loop (frame IO lives there anyway);
    the per-window fine-tune+infer is jitted with static window shapes, so
    there is exactly one compile per (H, W, window) signature;
  * early stopping is the masked-scan latch from meta_optimizer.fine_tune.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from e_osvos_tpu.data import transforms
from e_osvos_tpu.data.datasets import binarize_label
from e_osvos_tpu.meta_optim import (
    MetaOptimConfig,
    MetaParams,
    fine_tune,
)
from e_osvos_tpu.ops import losses as loss_ops
from e_osvos_tpu.ops import metrics as metric_ops
from e_osvos_tpu.ops.bits import unpack_mask_bits as unpack_bits_host

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class OneShotConfig:
    """Evaluation configuration.

    Mirrors the reference's eval knobs: ``num_epochs`` (cfgs/meta.yaml:24-26,
    100 for e-OSVOS-100), ``batch_size`` = augmented support copies per step
    (batch_sizes.train=3, cfgs/eval_e-osvos-OnA.yaml:5), online adaptation
    ``step``/``num_epochs``/``min_prop`` (cfgs/meta.yaml:30-34), loss
    (loss_func, cfgs/meta.yaml:68), early-stop patience
    (helper_func.py:388-397 callers).
    """

    num_epochs: int = 10
    batch_size: int = 3
    loss_func: str = "dice"
    early_stop_patience: int = 0
    # online adaptation (0 = disabled, parity: eval_online_adapt.step=5)
    online_adapt_step: int = 0
    online_adapt_epochs: int = 10
    online_adapt_min_prop: float = 0.75
    # segmentation threshold for binary masks
    threshold: float = 0.5
    normalize_mode: str = "davis"
    # fused-OnA window-count bucketing: pad the window axis up to a
    # multiple of this (whole replicated trailing windows, refits gated
    # off past the real count) so a heterogeneous-LENGTH dataset compiles
    # a bounded number of fused programs; 0 = exact window count. Cropped
    # outputs are bit-identical either way (window i depends only on
    # refits of windows < i).
    ona_window_bucket: int = 0
    # resolution bucketing for heterogeneous-resolution eval (YT-VOS
    # validates at native size, youtube.py:58-109): pad frames to the next
    # multiple so the number of compiled programs is bounded by the bucket
    # count, not the distinct-resolution count; 0 = exact shapes. Scoring
    # always runs on the original geometry (probs cropped back).
    pad_multiple: int = 0
    augment: transforms.AugmentConfig = dataclasses.field(
        default_factory=transforms.AugmentConfig
    )


def make_support_loss_fn(
    model_apply: Callable,
    cfg: OneShotConfig,
) -> Callable:
    """Loss over one on-device-augmented support batch.

    Returned fn signature: ``loss_fn(params, (key, img, label)) -> scalar``
    where img is the raw [H,W,3] uint8-range support frame and label the
    {0,1,255} mask. 255 pixels (ignore / warp border) are masked out via the
    losses' ``valid`` argument.
    """

    def loss_fn(params, batch):
        key, img, label = batch
        imgs, labels = transforms.augment_support_batch(
            key, img.astype(jnp.float32), label, cfg.batch_size, cfg.augment
        )
        imgs = transforms.normalize(imgs, cfg.normalize_mode)
        valid = labels != 255
        gts = jnp.where(valid, labels, 0).astype(jnp.float32)
        logits = model_apply(params, imgs)[..., 0]
        return loss_ops.compute_loss(cfg.loss_func, logits, gts, valid)

    return loss_fn


def make_pseudo_gt_loss_fn(
    model_apply: Callable,
    cfg: OneShotConfig,
) -> Callable:
    """Online-adaptation loss (evaluate.py:215-253 parity): the OnA batch is
    ONE un-augmented support frame (the reference switches the transform to
    ToTensor-only and takes ``inputs[:1]``) plus the last
    ``min(step, batch_sizes.train)`` propagated pseudo-GT frames. Batch =
    (support_img, support_label, prop_imgs [K,H,W,3], prop_labels [K,H,W] in
    {0,1,255}; empty-mask pseudo frames arrive fully 255 so the valid mask
    removes them, matching the reference's skip)."""

    def loss_fn(params, batch):
        img, label, prop_imgs, prop_labels = batch
        imgs = jnp.concatenate(
            [img.astype(jnp.float32)[None], prop_imgs.astype(jnp.float32)],
            axis=0,
        )
        labels = jnp.concatenate([label[None], prop_labels], axis=0)
        imgs = transforms.normalize(imgs, cfg.normalize_mode)
        valid = labels != 255
        gts = jnp.where(valid, labels, 0).astype(jnp.float32)
        logits = model_apply(params, imgs)[..., 0]
        return loss_ops.compute_loss(cfg.loss_func, logits, gts, valid)

    return loss_fn


def fine_tune_on_support(
    model_apply: Callable,
    meta_cfg: MetaOptimConfig,
    cfg: OneShotConfig,
    meta_params: MetaParams,
    key: Array,
    img: Array,
    label: Array,
    init_params: Any = None,
) -> Tuple[Any, Array]:
    """One-shot adaptation: ``num_epochs`` learned-SGD steps on augmented
    support copies, as a single scan. Returns (params, per-step losses)."""
    loss_fn = make_support_loss_fn(model_apply, cfg)
    keys = jax.random.split(key, cfg.num_epochs)
    batches = (
        keys,
        jnp.broadcast_to(img, (cfg.num_epochs,) + img.shape),
        jnp.broadcast_to(label, (cfg.num_epochs,) + label.shape),
    )
    return fine_tune(
        meta_cfg,
        loss_fn,
        meta_params,
        batches,
        init_params=init_params,
        early_stop_patience=cfg.early_stop_patience,
    )


def segment_frames(
    model_apply: Callable,
    cfg: OneShotConfig,
    params: Any,
    frames: Array,
) -> Array:
    """Inference over a [T,H,W,3] raw frame stack → [T,H,W] fg probability."""
    imgs = transforms.normalize(frames.astype(jnp.float32), cfg.normalize_mode)
    logits = model_apply(params, imgs)[..., 0]
    return jax.nn.sigmoid(logits)


def pseudo_ignore_padding(pseudo: Array, orig_hw) -> Array:
    """Bucket-padded pixels must never become pseudo ground truth: the
    model's response to the zero-padding is not a prediction about the
    scene. 255 = ignore; applied on the last two (H, W) axes."""
    if orig_hw is None:
        return pseudo
    h0, w0 = orig_hw
    if (h0, w0) == pseudo.shape[-2:]:
        return pseudo
    pseudo = pseudo.at[..., h0:, :].set(255)
    return pseudo.at[..., :, w0:].set(255)


def make_ona_refit_fn(
    model_apply: Callable,
    meta_cfg: MetaOptimConfig,
    cfg: OneShotConfig,
) -> Callable:
    """Online-adaptation re-fit: ``online_adapt_epochs`` deterministic
    learned-SGD steps on (support + pseudo-GT) with FIRST_STEP continuation
    (reset_model_mode, evaluate.py:196-205). Pure; callable inside jit."""
    loss_fn = make_pseudo_gt_loss_fn(model_apply, cfg)

    def refit(meta_params, img, label, prop_imgs, prop_labels, params):
        n = cfg.online_adapt_epochs
        batches = (
            jnp.broadcast_to(img, (n,) + img.shape),
            jnp.broadcast_to(label, (n,) + label.shape),
            jnp.broadcast_to(prop_imgs, (n,) + prop_imgs.shape),
            jnp.broadcast_to(prop_labels, (n,) + prop_labels.shape),
        )
        return fine_tune(
            meta_cfg,
            loss_fn,
            meta_params,
            batches,
            init_params=params,
            early_stop_patience=cfg.early_stop_patience,
            reset=False,
        )[0]

    return refit


def build_pseudo_gt(w_probs: Array, min_prop: float, orig_hw) -> Array:
    """Propagated predictions → pseudo ground truth (evaluate.py:215-253):
    prob ≥ min_prop → 1, ≤ 1-min_prop → 0, else 255 (ignore); frames with
    no confident foreground become all-255 (the reference skips them);
    bucket-padded pixels are always 255. w_probs: [K,H,W]."""
    pseudo = jnp.where(
        w_probs >= min_prop,
        1,
        jnp.where(w_probs <= 1.0 - min_prop, 0, 255),
    ).astype(jnp.int32)
    pseudo = pseudo_ignore_padding(pseudo, orig_hw)
    has_fg = jnp.any(pseudo == 1, axis=(1, 2))
    return jnp.where(has_fg[:, None, None], pseudo, 255)


def propagate_windows_fused(
    model_apply: Callable,
    meta_cfg: MetaOptimConfig,
    cfg: OneShotConfig,
    orig_hw,
    meta_params: MetaParams,
    support_img: Array,
    support_label: Array,
    windows: Array,
    params: Any,
    wn_real: Array,
) -> Tuple[Array, Any]:
    """The ENTIRE online-adaptation propagation as one XLA program.

    The host-loop formulation dispatches ~10 eager ops per 5-frame window
    (slices, pseudo-GT construction, scatter) — each a device round-trip,
    which dominates small-T runtimes under a remote runtime. Here the
    window loop is a ``lax.scan``: segment the window, build pseudo-GT from
    its tail, re-fit (skipped from the last REAL window on via
    ``lax.cond``, matching the host loop's ``end < T`` guard), carry the
    params. One dispatch per sequence instead of ~12 per window.

    windows: [Wn, step, H, W, 3] raw frames AFTER the support frame, the
    tail window padded by replicating the last real frame (padded outputs
    are cropped by the caller). ``wn_real`` (traced int32) is the number
    of windows holding real frames: window-count bucketing
    (``stack_windows(..., bucket=...)``) pads Wn so heterogeneous-length
    datasets compile a bounded number of programs, and because window i's
    probabilities depend only on refits of windows < i, cropped outputs
    are bit-identical to the unbucketed program. Returns
    ([Wn*step, H, W] probs, params).
    """
    refit = make_ona_refit_fn(model_apply, meta_cfg, cfg)
    k = min(cfg.online_adapt_step, cfg.batch_size)
    wn = windows.shape[0]

    def body(params, xs):
        window, i = xs
        w_probs = segment_frames(model_apply, cfg, params, window)
        pseudo = build_pseudo_gt(
            w_probs[-k:], cfg.online_adapt_min_prop, orig_hw
        )
        new_params = jax.lax.cond(
            i < wn_real - 1,
            lambda p: refit(
                meta_params, support_img, support_label, window[-k:],
                pseudo, p,
            ),
            lambda p: p,
            params,
        )
        return new_params, w_probs

    params, probs = jax.lax.scan(body, params, (windows, jnp.arange(wn)))
    return probs.reshape((-1,) + probs.shape[2:]), params


def stack_windows(
    frames_rest: Array, step: int, bucket: int = 0
) -> Tuple[Array, int, int]:
    """[R,H,W,3] → [Wn,step,H,W,3] for the fused window scan, tail padded
    by replicating the last real frame. ``bucket`` > 0 additionally pads
    the WINDOW COUNT up to a multiple of ``bucket`` (whole replicated
    windows), bounding the number of compiled fused programs across a
    heterogeneous-length dataset. Returns (windows, R, wn_real) where
    wn_real is the window count before bucketing."""
    r = frames_rest.shape[0]
    pad = (-r) % step
    if pad:
        tail = jnp.broadcast_to(
            frames_rest[-1:], (pad,) + tuple(frames_rest.shape[1:])
        )
        frames_rest = jnp.concatenate([frames_rest, tail], axis=0)
    wn_real = frames_rest.shape[0] // step
    wn = wn_real
    if bucket:
        wn = -(-wn_real // bucket) * bucket
        if wn != wn_real:
            extra = jnp.broadcast_to(
                frames_rest[-1:],
                ((wn - wn_real) * step,) + tuple(frames_rest.shape[1:]),
            )
            frames_rest = jnp.concatenate([frames_rest, extra], axis=0)
    return (
        frames_rest.reshape((wn, step) + frames_rest.shape[1:]),
        r,
        wn_real,
    )


def one_shot_packed(
    model_apply: Callable,
    meta_cfg: MetaOptimConfig,
    cfg: OneShotConfig,
    meta_params: MetaParams,
    key: Array,
    support_img: Array,
    support_label: Array,
    frames: Array,
    init_params: Any = None,
) -> Array:
    """One-shot fine-tune → full-sequence inference → threshold → bit-pack
    as ONE XLA program.

    This is the e-OSVOS-T deliverable (fine-tune on the support frame, then
    propagate, evaluate.py:152,319-320) collapsed to a single dispatch: no
    intermediate host↔device round-trip exists between the learned-SGD scan
    and the packed wire mask (8 px/byte, ops/bits.py). Under a remote
    runtime, round-trips — not FLOPs — dominate small-T evaluation
    (PERF.md small-T attribution), so the whole sequence costs one async
    dispatch + one packed fetch. Returns uint8 [T, H, ceil(W/8)].
    """
    from e_osvos_tpu.ops.bits import pack_mask_bits

    params, _ = fine_tune_on_support(
        model_apply, meta_cfg, cfg, meta_params, key, support_img,
        support_label, init_params,
    )
    probs = segment_frames(model_apply, cfg, params, frames)
    return pack_mask_bits(probs >= cfg.threshold)


def one_shot_packed_ona(
    model_apply: Callable,
    meta_cfg: MetaOptimConfig,
    cfg: OneShotConfig,
    orig_hw,
    meta_params: MetaParams,
    key: Array,
    support_img: Array,
    support_label: Array,
    windows: Array,
    wn_real: Array,
    init_params: Any = None,
) -> Array:
    """The flagship e-OSVOS-OnA serving program: one-shot fine-tune →
    fused windowed online adaptation → threshold → bit-pack, as ONE XLA
    program (``one_shot_packed`` composed with ``propagate_windows_fused``).

    ``windows``: [Wn, step, H, W, 3] frames AFTER the support frame
    (``stack_windows``). Returns uint8 [Wn*step, H, ceil(W/8)] packed
    masks for those frames; the caller crops replicated tail rows and any
    bucket padding host-side. The reference's steady-state OnA timing
    (evaluate.py:152) maps onto exactly this region: everything between
    consuming a staged frame stack and materializing the masks.
    """
    from e_osvos_tpu.ops.bits import pack_mask_bits

    params, _ = fine_tune_on_support(
        model_apply, meta_cfg, cfg, meta_params, key, support_img,
        support_label, init_params,
    )
    probs, _ = propagate_windows_fused(
        model_apply, meta_cfg, cfg, orig_hw, meta_params, support_img,
        support_label, windows, params, wn_real,
    )
    return pack_mask_bits(probs >= cfg.threshold)


def _fine_tune_objects(
    model_apply: Callable,
    meta_cfg: MetaOptimConfig,
    cfg: OneShotConfig,
    meta_params: MetaParams,
    key: Array,
    support_img: Array,
    labels: Array,
    init_params: Any,
):
    """vmapped one-shot fine-tune over the object axis with the SAME key
    schedule as ``_eval_objects_batched`` (object i gets fold_in(key, i)),
    so stream results stay bit-equal to the per-sequence driver."""
    n = labels.shape[0]
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n))
    params_o, _ = jax.vmap(
        lambda k, l: fine_tune_on_support(
            model_apply, meta_cfg, cfg, meta_params, k, support_img, l,
            init_params,
        )
    )(keys, labels)
    return params_o


def _pack_merged_planes(merged: Array, num_objects: int) -> Array:
    """[T,H,W] merged labels → uint8 [O,T,H,ceil(W/8)] per-object bit
    planes (plane o is ``merged == o+1``). Planes are disjoint by argmax
    construction, so the host reconstructs the label map exactly while the
    wire carries O/8 bytes per pixel instead of 1."""
    from e_osvos_tpu.ops.bits import pack_mask_bits

    ids = 1 + jnp.arange(num_objects)
    planes = merged[None] == ids[:, None, None, None]
    return pack_mask_bits(planes)


_pack_planes_jit = jax.jit(_pack_merged_planes, static_argnums=1)


def build_gt_stack(index, seq_name: str, seq, T: int, hw):
    """Host-side GT assembly for device scoring (ops/metrics.py::
    sequence_scores): per-frame raw id maps stacked uint8 [T,h,w]
    (255-filled for frame 0 and unannotated frames), the per-frame
    annotated mask, and the per-group id table padded with -1."""
    gt_stack = np.full((T,) + tuple(hw), 255, np.uint8)
    has_gt = np.zeros((T,), bool)
    for t in range(1, T):
        gt = index.get_label(seq_name, t)
        if gt is None:
            continue
        gt_stack[t] = gt
        has_gt[t] = True
    n_ids = max(1, max((len(g.object_ids) for g in seq.object_groups),
                       default=1))
    ids = np.full((len(seq.object_groups), n_ids), -1, np.int32)
    for gi, g in enumerate(seq.object_groups):
        ids[gi, : len(g.object_ids)] = g.object_ids
    return gt_stack, has_gt, ids


def score_merged_device(index, seq_name: str, seq, merged):
    """Per-object J/F means of a merged label map, computed in ONE device
    program (replaces the eager 2-dispatches-per-frame-per-object loop —
    42% of the detection path's all-in time, BENCH_DET_ATTRIB.json).
    Frame semantics match the eager loop: frames 1..T-1 with annotations.

    Returns (j_means, f_means, has_gt)."""
    merged = jnp.asarray(merged)
    T = merged.shape[0]
    gt_stack, has_gt, ids = build_gt_stack(
        index, seq_name, seq, T, merged.shape[1:]
    )
    J, F = metric_ops._sequence_scores_jit(
        merged, jnp.asarray(gt_stack), jnp.asarray(ids)
    )
    J, F = np.asarray(J), np.asarray(F)
    any_gt = bool(has_gt.any())
    j_means = [
        float(np.mean(J[gi, has_gt])) if any_gt else float("nan")
        for gi in range(len(seq.object_groups))
    ]
    f_means = [
        float(np.mean(F[gi, has_gt])) if any_gt else float("nan")
        for gi in range(len(seq.object_groups))
    ]
    return j_means, f_means, has_gt


def one_shot_packed_objects(
    model_apply: Callable,
    meta_cfg: MetaOptimConfig,
    cfg: OneShotConfig,
    meta_params: MetaParams,
    key: Array,
    support_img: Array,
    labels: Array,
    frames: Array,
    init_params: Any = None,
) -> Array:
    """Multi-object serving program (no OnA): vmapped fine-tune over the
    object axis, full-stack segmentation, per-pixel argmax merge
    (evaluate.py:322-326), per-object bit-plane pack — ONE XLA program.
    labels: [O,H,W] binarized {0,1,255} per object group. Returns uint8
    [O, T, H, ceil(W/8)]; the support row and any frames before it are
    overwritten host-side (GT / zeros), as ``eval_sequence`` does."""
    params_o = _fine_tune_objects(
        model_apply, meta_cfg, cfg, meta_params, key, support_img, labels,
        init_params,
    )
    probs = jax.vmap(
        lambda p: segment_frames(model_apply, cfg, p, frames)
    )(params_o)  # [O,T,H,W]
    merged = merge_objects(probs, cfg.threshold)
    return _pack_merged_planes(merged, labels.shape[0])


def one_shot_packed_objects_ona(
    model_apply: Callable,
    meta_cfg: MetaOptimConfig,
    cfg: OneShotConfig,
    orig_hw,
    meta_params: MetaParams,
    key: Array,
    support_img: Array,
    labels: Array,
    windows: Array,
    wn_real: Array,
    init_params: Any = None,
) -> Array:
    """Multi-object OnA serving program: vmapped fine-tune + fused windowed
    online adaptation over the object axis (the device schedule of
    ``_eval_objects_batched``'s fused path), argmax merge, bit-plane pack —
    ONE XLA program per sequence. Returns uint8 [O, Wn*step, H, ceil(W/8)]
    for the frames after the shared support frame."""
    params_o = _fine_tune_objects(
        model_apply, meta_cfg, cfg, meta_params, key, support_img, labels,
        init_params,
    )
    w_flat, _ = jax.vmap(
        lambda l, p: propagate_windows_fused(
            model_apply, meta_cfg, cfg, orig_hw, meta_params, support_img,
            l, windows, p, wn_real,
        )
    )(labels, params_o)  # [O, Wn*step, H, W]
    merged = merge_objects(w_flat, cfg.threshold)
    return _pack_merged_planes(merged, labels.shape[0])


def _pad_frame_np(img: np.ndarray, hw) -> np.ndarray:
    """Zero-pad one [H,W,3] host frame bottom/right to the device
    geometry (bucket padding) before its standalone upload."""
    th, tw = hw
    if img.shape[:2] == (th, tw):
        return img
    return np.pad(
        img, ((0, th - img.shape[0]), (0, tw - img.shape[1]), (0, 0))
    )


def merge_objects(probs: Array, threshold: float = 0.5) -> Array:
    """Per-pixel argmax over per-object probability maps with background
    threshold (evaluate.py:322-326). probs: [O,H,W] (or [O,T,H,W]) →
    int32 label map with 0 = background, k+1 = object k."""
    bg = jnp.full_like(probs[:1], threshold)
    stacked = jnp.concatenate([bg, probs], axis=0)
    return jnp.argmax(stacked, axis=0).astype(jnp.int32)


class OneShotEvaluator:
    """Drives per-sequence one-shot evaluation over a dataset index.

    ``model_apply(params, imgs[B,H,W,3]) -> logits [B,H,W,1]``.
    """

    def __init__(
        self,
        model_apply: Callable,
        meta_cfg: MetaOptimConfig,
        cfg: OneShotConfig,
        batch_objects: bool = True,
        mesh: Optional[Any] = None,
        fused_ona: bool = False,
    ):
        self.model_apply = model_apply
        self.meta_cfg = meta_cfg
        self.cfg = cfg
        self.batch_objects = batch_objects
        # fused single-program OnA propagation (propagate_windows_fused);
        # the frame-sharded path keeps the host window loop, and tests use
        # fused_ona=False as the reference formulation
        self.fused_ona = fused_ona and cfg.online_adapt_step > 0
        self._fused_cache: Dict[Any, Callable] = {}
        self._stream_cache: Dict[Any, Callable] = {}
        self._jit_ft = jax.jit(
            partial(fine_tune_on_support, model_apply, meta_cfg, cfg)
        )
        self._jit_seg = jax.jit(partial(segment_frames, model_apply, cfg))
        # objects as a batch axis (SURVEY.md §7 step 4): one compiled
        # program fine-tunes ALL object groups of a sequence simultaneously
        # (the reference loops them serially, evaluate.py:132); meta-params
        # and the support frame broadcast, keys/labels/params carry the
        # object axis
        def _ft_one(meta_params, key, img, label, init_params):
            return fine_tune_on_support(
                model_apply, meta_cfg, cfg, meta_params, key, img, label,
                init_params,
            )

        self._jit_ft_objs = jax.jit(
            jax.vmap(_ft_one, in_axes=(None, 0, None, 0, None))
        )
        self._jit_seg_objs = jax.jit(
            jax.vmap(
                partial(segment_frames, model_apply, cfg),
                in_axes=(0, None),
            )
        )
        loss_fn = make_pseudo_gt_loss_fn(model_apply, cfg)

        def _ona_ft(meta_params, key, img, label, prop_imgs, prop_labels, init_params):
            del key  # OnA steps are deterministic (no augmentation)
            n = cfg.online_adapt_epochs
            batches = (
                jnp.broadcast_to(img, (n,) + img.shape),
                jnp.broadcast_to(label, (n,) + label.shape),
                jnp.broadcast_to(prop_imgs, (n,) + prop_imgs.shape),
                jnp.broadcast_to(prop_labels, (n,) + prop_labels.shape),
            )
            # FIRST_STEP continuation: keep the already-fine-tuned params
            # (reset_model_mode, evaluate.py:196-205)
            return fine_tune(
                meta_cfg,
                loss_fn,
                meta_params,
                batches,
                init_params=init_params,
                early_stop_patience=cfg.early_stop_patience,
                reset=False,
            )

        # donate the carried params (the ~160 MB tree is dead after the
        # refit — aliasing it into the output avoids an HBM copy per window)
        self._jit_ona_ft = jax.jit(_ona_ft, donate_argnums=(6,))
        # object-batched OnA: the per-window (segment → pseudo-GT → re-fit)
        # chain vmapped over the object axis; windows remain a host loop so
        # ragged final windows only add one extra compile
        self._jit_seg_objs_w = self._jit_seg_objs

        def _ona_ft_obj(meta_params, img, label, prop_imgs, prop_labels, params):
            return _ona_ft(meta_params, None, img, label, prop_imgs,
                           prop_labels, params)[0]

        self._jit_ona_ft_objs = jax.jit(
            jax.vmap(_ona_ft_obj, in_axes=(None, None, 0, None, 0, 0)),
            donate_argnums=(5,),
        )
        if mesh is not None:
            self._install_frame_sharding(mesh)
            # windows are sequential; frame-parallel inference already owns
            # the throughput win on the sharded path
            self.fused_ona = False

    def _fused_propagate(self, orig_hw, batched: bool) -> Callable:
        """Jitted propagate_windows_fused, cached per (orig_hw, batched).
        orig_hw is static (bucket-crop geometry baked into the program);
        ``batched`` vmaps the object axis over (support_label, params)."""
        key = (orig_hw, batched)
        fn = self._fused_cache.get(key)
        if fn is None:
            base = partial(
                propagate_windows_fused, self.model_apply, self.meta_cfg,
                self.cfg, orig_hw,
            )
            if batched:
                base = jax.vmap(
                    base, in_axes=(None, None, 0, None, 0, None)
                )
            fn = jax.jit(base, donate_argnums=(4,))
            self._fused_cache[key] = fn
        return fn

    _stack_windows = staticmethod(stack_windows)

    def _install_frame_sharding(self, mesh) -> None:
        """Frame-parallel inference over a device mesh.

        Frames are independent given the fine-tuned parameters (per-frame
        CNN, SURVEY.md §5.7), so segmentation is pure data parallelism:
        the frame axis shards over the mesh's first axis, parameters are
        replicated, and XLA moves nothing over ICI except the initial
        broadcast. This is a capability beyond the reference (whose eval
        binds one whole GPU per dataset, evaluate.py:20,
        train_meta.py:134-146); fine-tune and OnA refits stay replicated —
        they are sequential scans with a small per-step batch."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = mesh.axis_names[0]
        n = int(np.prod(list(mesh.shape.values())))
        rep = NamedSharding(mesh, P())
        frame_sh = NamedSharding(mesh, P(axis))
        obj_frame_sh = NamedSharding(mesh, P(None, axis))
        seg = jax.jit(
            partial(segment_frames, self.model_apply, self.cfg),
            in_shardings=(rep, frame_sh),
            out_shardings=frame_sh,
        )
        seg_objs = jax.jit(
            jax.vmap(
                partial(segment_frames, self.model_apply, self.cfg),
                in_axes=(0, None),
            ),
            in_shardings=(rep, frame_sh),
            out_shardings=obj_frame_sh,
        )

        def pad_call(f, params, frames, out_frame_axis):
            t = frames.shape[0]
            pad = (-t) % n
            if pad:  # replicate the last frame up to a full shard multiple
                tail = jnp.broadcast_to(
                    frames[-1:], (pad,) + tuple(frames.shape[1:])
                )
                frames = jnp.concatenate([frames, tail], axis=0)
            out = f(params, frames)
            return out[:t] if out_frame_axis == 0 else out[:, :t]

        self._jit_seg = partial(pad_call, seg, out_frame_axis=0)
        self._jit_seg_objs = partial(pad_call, seg_objs, out_frame_axis=1)
        self._jit_seg_objs_w = self._jit_seg_objs

    # ---- per-sequence driver (host loop over OnA windows) ----

    def eval_sequence(
        self,
        index,
        seq_name: str,
        meta_params: MetaParams,
        key: Array,
        init_params: Any = None,
    ) -> Dict[str, Any]:
        """Fine-tune + propagate one sequence; returns per-frame merged
        labels, per-object probs, and J/F statistics."""
        from e_osvos_tpu.data.loader import load_frames

        seq = index.sequences[seq_name]
        T = len(seq)
        # native threaded prefetch when the sequence is JPEG-backed
        frames_np = load_frames(index, seq_name)
        h0, w0 = frames_np.shape[1], frames_np.shape[2]
        hw_dev = (
            transforms.bucket_hw(h0, w0, self.cfg.pad_multiple)
            if self.cfg.pad_multiple else (h0, w0)
        )
        groups = seq.object_groups
        # upload-overlap: the support frame(s) go up FIRST as their own
        # small transfers, so the one-shot fine-tune dispatches (and runs)
        # while the full [T,H,W,3] stack — the dominant wire cost at small
        # T, see PERF.md small-T attribution — streams up concurrently
        sup_dev = {
            sf: jnp.asarray(_pad_frame_np(frames_np[sf], hw_dev))
            for sf in {g.support_frame for g in groups}
        }
        frames_j = jnp.asarray(frames_np)
        if self.cfg.pad_multiple:
            frames_j = transforms.pad_frames_to_multiple(
                frames_j, self.cfg.pad_multiple
            )

        same_support = len({g.support_frame for g in groups}) == 1
        if self.batch_objects and len(groups) > 1 and same_support:
            probs = self._eval_objects_batched(
                index, seq, frames_j, meta_params, key, init_params,
                orig_hw=(h0, w0),
                support_img=sup_dev[groups[0].support_frame],
            )  # [O,T,H,W]
        else:
            obj_probs = []
            for gi, group in enumerate(groups):
                gkey = jax.random.fold_in(key, gi)
                p = self._eval_object_group(
                    index, seq, frames_j, group, meta_params, gkey,
                    init_params, orig_hw=(h0, w0),
                    support_img=sup_dev[group.support_frame],
                )
                obj_probs.append(p)
            probs = jnp.stack(obj_probs)  # [O,T,H,W]
        probs = probs[..., :h0, :w0]  # crop bucket padding before scoring
        merged = merge_objects(probs, self.cfg.threshold)  # [T,H,W]
        j_means, f_means = self._score_merged(index, seq_name, seq, merged)
        return {
            "seq": seq_name,
            "merged": np.asarray(merged),
            "probs": np.asarray(probs),
            "J_per_object": j_means,
            "F_per_object": f_means,
            "J_mean": float(np.nanmean(j_means)) if j_means else float("nan"),
            "F_mean": float(np.nanmean(f_means)) if f_means else float("nan"),
        }

    def _stream_fn(self, kind: str, orig_hw) -> Callable:
        """Jitted serving program, cached per (kind, orig_hw). kind ∈
        {plain, ona, objs, objs_ona}; orig_hw is static only for the OnA
        variants (pseudo-GT bucket-crop geometry baked into the refits,
        same caching as ``_fused_propagate``)."""
        k = (kind, orig_hw)
        fn = self._stream_cache.get(k)
        if fn is None:
            base = {
                "plain": one_shot_packed,
                "objs": one_shot_packed_objects,
            }.get(kind)
            if base is not None:
                fn = jax.jit(
                    partial(base, self.model_apply, self.meta_cfg, self.cfg)
                )
            else:
                base = (one_shot_packed_ona if kind == "ona"
                        else one_shot_packed_objects_ona)
                fn = jax.jit(
                    partial(base, self.model_apply, self.meta_cfg, self.cfg,
                            orig_hw)
                )
            self._stream_cache[k] = fn
        return fn

    def eval_stream(
        self,
        index,
        seq_names,
        meta_params: MetaParams,
        key: Array,
        init_params: Any = None,
    ) -> Dict[str, np.ndarray]:
        """Pipelined one-shot segmentation over many sequences (serving
        mode), covering the full flagship protocol: online adaptation
        (fused windowed refits) and multi-object sequences (objects as a
        vmapped batch axis, argmax-merged on device).

        jax dispatch is asynchronous, so issuing every sequence's fused
        (fine-tune [→ OnA windows] → threshold/merge → bit-pack) program
        before fetching ANY result overlaps the three wire phases:
        sequence k+1's [T,H,W,3] upload streams while sequence k computes,
        and only bit-packed masks (8 px/byte; one plane per object) come
        back, drained in order at the end. This is the steady-state
        deployment shape — the reference's DataLoader worker pool plays
        the same overlap role on its side (SURVEY.md §2.3).

        Key schedule mirrors ``eval_sequence`` exactly, so stream(key)
        row i equals eval_sequence(fold_in(key, i)) bit-exactly on the
        matching path (single object: the serial fused path; multi-object
        shared support: the batched fused path). Objects with distinct
        support frames (YT-VOS mid-sequence entries) fall back to the
        per-sequence driver for that sequence.

        Returns {name: uint8 [T,H,W]} label maps (0 = background, k+1 =
        object k; single-object sequences yield {0,1} masks) with the
        support row replaced by GT and frames before it zero
        (evaluate.py protocol: frame 0 is given).
        """
        from e_osvos_tpu.data.loader import load_frames

        cfg = self.cfg
        pend: List[Tuple] = []
        for i, name in enumerate(seq_names):
            seq = index.sequences[name]
            groups = seq.object_groups
            key_i = jax.random.fold_in(key, i)
            same_support = len({g.support_frame for g in groups}) == 1
            multi = self.batch_objects and len(groups) > 1 and same_support
            if len(groups) > 1 and not multi:
                res = self.eval_sequence(
                    index, name, meta_params, key_i, init_params
                )
                pend.append(("done", name, res["merged"].astype(np.uint8)))
                continue
            frames_np = load_frames(index, name)
            T, h0, w0 = frames_np.shape[:3]
            hw_dev = (
                transforms.bucket_hw(h0, w0, cfg.pad_multiple)
                if cfg.pad_multiple else (h0, w0)
            )
            sf = groups[0].support_frame
            gt = index.get_label(name, sf)
            # support frame + label first (small uploads): the fine-tune
            # dispatches and runs while the full stack streams up
            sup = jnp.asarray(_pad_frame_np(frames_np[sf], hw_dev))
            frames_j = jnp.asarray(frames_np)
            if cfg.pad_multiple:
                frames_j = transforms.pad_frames_to_multiple(
                    frames_j, cfg.pad_multiple
                )
            ona = cfg.online_adapt_step > 0 and sf + 1 < T
            if multi:
                gt_bins = np.stack(
                    [binarize_label(gt, g.object_ids) for g in groups]
                )
                labels = jax.vmap(
                    lambda l: transforms.pad_label_to(l, hw_dev)
                )(jnp.asarray(gt_bins, jnp.int32))
                if ona:
                    windows, r, wn_real = stack_windows(
                        frames_j[sf + 1:], cfg.online_adapt_step,
                        cfg.ona_window_bucket,
                    )
                    packed = self._stream_fn("objs_ona", (h0, w0))(
                        meta_params, key_i, sup, labels, windows,
                        jnp.int32(wn_real), init_params,
                    )
                    row0, rows = sf + 1, min(r, T - sf - 1)
                else:
                    packed = self._stream_fn("objs", None)(
                        meta_params, key_i, sup, labels, frames_j,
                        init_params,
                    )
                    row0, rows = 0, T
                pend.append(("multi", name, (sf, gt_bins, (T, h0, w0),
                                             row0, rows, packed)))
            else:
                gt_bin = binarize_label(gt, groups[0].object_ids)
                label = transforms.pad_label_to(
                    jnp.asarray(gt_bin, jnp.int32), hw_dev
                )
                gkey = jax.random.fold_in(key_i, 0)
                k_ft, _ = jax.random.split(gkey)
                if ona:
                    windows, r, wn_real = stack_windows(
                        frames_j[sf + 1:], cfg.online_adapt_step,
                        cfg.ona_window_bucket,
                    )
                    packed = self._stream_fn("ona", (h0, w0))(
                        meta_params, k_ft, sup, label, windows,
                        jnp.int32(wn_real), init_params,
                    )
                    row0, rows = sf + 1, min(r, T - sf - 1)
                else:
                    packed = self._stream_fn("plain", None)(
                        meta_params, k_ft, sup, label, frames_j,
                        init_params,
                    )
                    row0, rows = 0, T
                pend.append(("single", name, (sf, gt_bin[None], (T, h0, w0),
                                              row0, rows, packed)))
        out = {}
        for tag, name, payload in pend:
            if tag == "done":
                out[name] = payload
                continue
            sf, gt_bins, (T, h0, w0), row0, rows, packed = payload
            mask = np.zeros((T, h0, w0), np.uint8)
            bits = unpack_bits_host(np.asarray(packed), w0)
            if tag == "single":
                mask[row0:row0 + rows] = bits[:rows, :h0]
            else:  # per-object disjoint bit planes → label map
                ids = np.arange(1, gt_bins.shape[0] + 1, dtype=np.uint8)
                merged = np.einsum(
                    "orhw,o->rhw", bits[:, :rows, :h0].astype(np.uint8), ids
                )
                mask[row0:row0 + rows] = merged
            if sf > 0:
                mask[:sf] = 0
            mask[sf] = np.einsum(
                "ohw,o->hw", (gt_bins == 1).astype(np.uint8),
                np.arange(1, gt_bins.shape[0] + 1, dtype=np.uint8),
            )
            out[name] = mask
        return out

    def _score_merged(
        self, index, seq_name: str, seq, merged: Array
    ) -> Tuple[List[float], List[float]]:
        """Per-object J/F of a merged label map against available GT (skip
        frame 0 per DAVIS protocol and frames without annotations). One
        device program for the whole sequence (score_merged_device)."""
        j_means, f_means, _ = score_merged_device(index, seq_name, seq, merged)
        return j_means, f_means

    def eval_sequence_init(
        self,
        index,
        seq_name: str,
        meta_params: MetaParams,
        init_params: Any = None,
    ) -> Dict[str, Any]:
        """J/F of the raw (un-fine-tuned) initialization over a sequence —
        the reference's ``init_J`` baseline curve (evaluate.py:123-127),
        logged once per eval run to show what one-shot adaptation adds.
        Multi-object caveat as in the reference: without adaptation the
        model cannot separate objects, so ties go to the first group."""
        from e_osvos_tpu.data.loader import load_frames

        seq = index.sequences[seq_name]
        frames_j = jnp.asarray(load_frames(index, seq_name))
        h0, w0 = frames_j.shape[1], frames_j.shape[2]
        if self.cfg.pad_multiple:
            frames_j = transforms.pad_frames_to_multiple(
                frames_j, self.cfg.pad_multiple
            )
        params = init_params if init_params is not None else meta_params.model_init
        probs = self._jit_seg(params, frames_j)[..., :h0, :w0]  # [T,H,W]
        probs_o = jnp.broadcast_to(
            probs[None], (len(seq.object_groups),) + tuple(probs.shape)
        )
        merged = merge_objects(probs_o, self.cfg.threshold)
        j_means, f_means = self._score_merged(index, seq_name, seq, merged)
        return {
            "seq": seq_name,
            "init_J_mean": float(np.nanmean(j_means)) if j_means else float("nan"),
            "init_F_mean": float(np.nanmean(f_means)) if f_means else float("nan"),
        }

    def _pseudo_ignore_padding(self, pseudo: Array, orig_hw) -> Array:
        return pseudo_ignore_padding(pseudo, orig_hw)

    def _eval_objects_batched(
        self,
        index,
        seq,
        frames_j: Array,
        meta_params: MetaParams,
        key: Array,
        init_params: Any,
        orig_hw=None,
        support_img: Optional[Array] = None,
    ) -> Array:
        """All object groups fine-tuned and propagated in ONE vmapped
        program (SURVEY.md §7 step 4: objects as a batch axis), including
        online-adaptation re-fits (the reference loops objects serially,
        evaluate.py:132). Requires a shared support frame (DAVIS protocol).
        Returns [O,T,H,W] probabilities. ``support_img`` may be a
        separately-uploaded copy of frames_j[sf] (upload-overlap)."""
        cfg = self.cfg
        groups = seq.object_groups
        sf = groups[0].support_frame
        if support_img is None:
            support_img = frames_j[sf]
        gt = index.get_label(seq.name, sf)
        labels = jnp.asarray(
            np.stack([binarize_label(gt, g.object_ids) for g in groups]),
            jnp.int32,
        )  # [O,H,W]
        labels = jax.vmap(
            lambda l: transforms.pad_label_to(l, frames_j.shape[1:3])
        )(labels)
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(len(groups))
        )
        params_o, _ = self._jit_ft_objs(
            meta_params, keys, support_img, labels, init_params
        )
        T = frames_j.shape[0]
        if cfg.online_adapt_step <= 0:
            probs = self._jit_seg_objs(params_o, frames_j)  # [O,T,H,W]
        elif self.fused_ona and sf + 1 < T:
            windows, r, wn_real = self._stack_windows(
                frames_j[sf + 1:], cfg.online_adapt_step,
                cfg.ona_window_bucket,
            )
            w_flat, _ = self._fused_propagate(orig_hw, batched=True)(
                meta_params, support_img, labels, windows, params_o,
                jnp.int32(wn_real),
            )  # [O, Wn*step, H, W]
            probs = jnp.zeros(
                (len(groups), T) + frames_j.shape[1:3], jnp.float32
            )
            probs = probs.at[:, sf + 1:].set(w_flat[:, :r])
        else:
            O = len(groups)
            probs = jnp.zeros((O, T) + frames_j.shape[1:3], jnp.float32)
            step = cfg.online_adapt_step
            start = sf + 1
            while start < T:
                end = min(start + step, T)
                window = frames_j[start:end]
                w_probs = self._jit_seg_objs(params_o, window)  # [O,w,H,W]
                probs = probs.at[:, start:end].set(w_probs)
                if end < T:
                    k = min(step, cfg.batch_size)
                    sel = w_probs[:, -k:]
                    pseudo = jnp.where(
                        sel >= cfg.online_adapt_min_prop,
                        1,
                        jnp.where(
                            sel <= 1.0 - cfg.online_adapt_min_prop, 0, 255
                        ),
                    ).astype(jnp.int32)
                    pseudo = self._pseudo_ignore_padding(pseudo, orig_hw)
                    has_fg = jnp.any(pseudo == 1, axis=(2, 3))
                    pseudo = jnp.where(has_fg[:, :, None, None], pseudo, 255)
                    params_o = self._jit_ona_ft_objs(
                        meta_params, support_img, labels, window[-k:],
                        pseudo, params_o,
                    )
                start = end
        # support frame gets GT (void 255 excluded); frames before it stay 0
        probs = probs.at[:, sf].set((labels == 1).astype(jnp.float32))
        if sf > 0:
            probs = probs.at[:, :sf].set(0.0)
        return probs

    def _eval_object_group(
        self,
        index,
        seq,
        frames_j: Array,
        group,
        meta_params: MetaParams,
        key: Array,
        init_params: Any,
        orig_hw=None,
        support_img: Optional[Array] = None,
    ) -> Array:
        """Returns [T,H,W] fg probability for one object group.
        ``support_img`` may be a separately-uploaded copy of frames_j[sf]
        (upload-overlap: it reaches the device before the full stack)."""
        cfg = self.cfg
        T = frames_j.shape[0]
        sf = group.support_frame
        if support_img is None:
            support_img = frames_j[sf]
        gt = index.get_label(seq.name, sf)
        support_label = transforms.pad_label_to(
            jnp.asarray(binarize_label(gt, group.object_ids), jnp.int32),
            frames_j.shape[1:3],
        )

        k_ft, k_ona = jax.random.split(key)
        params, _ = self._jit_ft(
            meta_params, k_ft, support_img, support_label, init_params
        )

        probs = jnp.zeros((T,) + frames_j.shape[1:3], jnp.float32)
        # frames before the support frame keep probability 0 (YT-VOS objects
        # appearing mid-sequence, youtube.py:131-185); support frame gets GT
        # (255-void pixels must NOT leak into the probability map)
        probs = probs.at[sf].set((support_label == 1).astype(jnp.float32))

        if self.fused_ona and sf + 1 < T:
            windows, r, wn_real = self._stack_windows(
                frames_j[sf + 1:], cfg.online_adapt_step,
                cfg.ona_window_bucket,
            )
            w_flat, _ = self._fused_propagate(orig_hw, batched=False)(
                meta_params, support_img, support_label, windows, params,
                jnp.int32(wn_real),
            )
            return probs.at[sf + 1:].set(w_flat[:r])

        step = cfg.online_adapt_step if cfg.online_adapt_step > 0 else T
        start = sf + 1
        window_id = 0
        while start < T:
            end = min(start + step, T)
            window = frames_j[start:end]
            w_probs = self._jit_seg(params, window)
            probs = probs.at[start:end].set(w_probs)

            if cfg.online_adapt_step > 0 and end < T:
                # re-adapt on support + the LAST min(step, batch) propagated
                # pseudo-GT frames (evaluate.py:215-253): prob ≥ min_prop →
                # 1, ≤ 1-min_prop → 0, else 255 (ignore); frames with no
                # confident fg become all-255 (the reference skips them)
                k = min(cfg.online_adapt_step, cfg.batch_size)
                sel_probs = w_probs[-k:]
                pseudo = jnp.where(
                    sel_probs >= cfg.online_adapt_min_prop,
                    1,
                    jnp.where(sel_probs <= 1.0 - cfg.online_adapt_min_prop, 0, 255),
                ).astype(jnp.int32)
                pseudo = self._pseudo_ignore_padding(pseudo, orig_hw)
                has_fg = jnp.any(pseudo == 1, axis=(1, 2))
                pseudo = jnp.where(has_fg[:, None, None], pseudo, 255)
                k_w = jax.random.fold_in(k_ona, window_id)
                params, _ = self._jit_ona_ft(
                    meta_params,
                    k_w,
                    support_img,
                    support_label,
                    window[-k:],
                    pseudo,
                    params,
                )
            start = end
            window_id += 1
        return probs
