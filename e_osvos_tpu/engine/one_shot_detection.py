"""One-shot evaluation for the detection model family (Mask R-CNN).

Reference flow (/root/reference/src/util/evaluate.py + helper_func.py
run_loader:67-159): fine-tune Mask R-CNN on frame 0 (mask targets
synthesized in-forward), then propagate frame-by-frame feeding the PREVIOUS
frame's predicted mask boxes into the RPN as augmented proposals
(helper_func.py:108-126 → mask_rcnn.py:251-332) — the tracking prior.
Empty-mask fallback switches to plain RPN proposals (helper_func.py:90-95).

TPU-native design: the fine-tune loop is the shared ``meta_optim.fine_tune``
scan (augmented support batches generated on device); frame propagation is a
``lax.scan`` over the window with the previous-frame boxes as carry — the
whole window (inference + tracking prior) is ONE compiled program instead of
a per-frame Python loop."""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from e_osvos_tpu.data import transforms
from e_osvos_tpu.data.datasets import binarize_label
from e_osvos_tpu.engine.one_shot import (
    OneShotConfig,
    _pad_frame_np,
    build_pseudo_gt,
    merge_objects,
    pseudo_ignore_padding,
    stack_windows,
)
from e_osvos_tpu.meta_optim import MetaOptimConfig, MetaParams, fine_tune
from e_osvos_tpu.ops.boxes import masks_to_boxes


@dataclasses.dataclass(frozen=True)
class DetectionOneShotConfig(OneShotConfig):
    """Adds the detection-specific knobs to the one-shot config."""

    proposal_aug_mode: str = "EXTEND"  # parent_model.eval_augment_rpn_proposals_mode
    box_from_mask_thresh: float = 0.5  # mask → next-frame box threshold
    # online adaptation extras (evaluate.py:141-253, meta_optim.py:209-210):
    # FULL restarts from the learned init each window, FIRST_STEP continues
    # from the current fine-tuned params; only_box_head masks all lrs except
    # the box/mask heads during OnA re-fits
    ona_reset_mode: str = "FIRST_STEP"  # [FULL, FIRST_STEP]
    ona_only_box_head: bool = False


class DetectionOneShotEvaluator:
    """Per-sequence one-shot eval driving a MaskRCNN flax module.

    ``model`` must be the MaskRCNN module (models/mask_rcnn.py); its
    detections_per_img defines how many instances are tracked per object
    group (1 in single_id VOS mode, evaluate.py:106-107)."""

    def __init__(
        self,
        model,
        meta_cfg: MetaOptimConfig,
        cfg: DetectionOneShotConfig,
        batch_objects: bool = True,
        mesh: Optional[Any] = None,
        fused_ona: bool = False,
    ):
        self.model = model
        self.meta_cfg = meta_cfg
        self.cfg = cfg
        self.batch_objects = batch_objects
        # fused single-program OnA propagation (the detection mirror of
        # one_shot.py::propagate_windows_fused); the object-sharded path
        # keeps the host window loop
        self.fused_ona = fused_ona and cfg.online_adapt_step > 0
        self._fused_cache: Dict[Any, Callable] = {}
        self._jit_pack: Optional[Callable] = None
        self._jit_stream_prep: Optional[Callable] = None
        self._shard_n = 0
        self._jit_ft = jax.jit(self._fine_tune)
        self._jit_window = jax.jit(self._segment_window)
        # donate the carried params on OnA refits (FIRST_STEP continuation
        # consumes them; aliasing avoids an HBM copy of the 176 MB tree)
        self._jit_ona_ft = jax.jit(self._ona_fine_tune, donate_argnums=(6,))
        # objects as a vmap batch axis (one compiled program fine-tunes and
        # tracks ALL object groups; the reference loops them serially,
        # evaluate.py:132) — per-object params, box carries, and pseudo-GT
        self._jit_ft_objs = jax.jit(
            jax.vmap(self._fine_tune, in_axes=(None, 0, None, 0, None))
        )
        self._jit_window_objs = jax.jit(
            jax.vmap(self._segment_window, in_axes=(0, None, 0, 0, 0))
        )
        self._jit_ona_ft_objs = jax.jit(
            jax.vmap(self._ona_fine_tune,
                     in_axes=(None, 0, None, 0, None, 0, 0)),
            donate_argnums=(6,),
        )
        if mesh is not None:
            self._install_object_sharding(mesh)
            self.fused_ona = False

    def _fused_propagate(self, orig_hw, batched: bool) -> Callable:
        """The windowed box-carry propagation + OnA refits as ONE jitted
        ``lax.scan`` over windows (the host loop dispatches ~12 eager ops
        per window — device round-trips that dominate under a remote
        runtime). Carry = (params, boxes, valid); refit is skipped on the
        last window via ``lax.cond`` (the host loop's ``end < T`` guard).
        Cached per (orig_hw, batched); windows must be pre-stacked
        [Wn, step, H, W, 3] with the tail padded by frame replication."""
        cache_key = (orig_hw, batched)
        fn = self._fused_cache.get(cache_key)
        if fn is not None:
            return fn
        cfg = self.cfg
        kk = min(cfg.online_adapt_step, cfg.batch_size)

        def prop(meta_params, support_img, support_label, windows,
                 w_keys, ona_keys, params, boxes0, valid0, wn_real):
            wn = windows.shape[0]

            def body(carry, xs):
                params, boxes, valid = carry
                window, k_run, k_ona, i = xs
                w_probs, _, _, boxes, valid = self._segment_window(
                    params, window, boxes, valid, k_run
                )
                pseudo = build_pseudo_gt(
                    w_probs[-kk:], cfg.online_adapt_min_prop, orig_hw
                )
                params = jax.lax.cond(
                    i < wn_real - 1,
                    lambda p: self._ona_fine_tune(
                        meta_params, k_ona, support_img, support_label,
                        window[-kk:], pseudo, p,
                    )[0],
                    lambda p: p,
                    params,
                )
                return (params, boxes, valid), w_probs

            (params, _, _), probs = jax.lax.scan(
                body, (params, boxes0, valid0),
                (windows, w_keys, ona_keys, jnp.arange(wn)),
            )
            return probs.reshape((-1,) + probs.shape[2:]), params

        if batched:
            # per-object: params/label/boxes/valid/keys carry the object
            # axis; meta-params, support frame, windows, and the real
            # window count broadcast
            prop = jax.vmap(
                prop, in_axes=(None, None, 0, None, 0, 0, 0, 0, 0, None)
            )
        fn = jax.jit(prop, donate_argnums=(6,))
        self._fused_cache[cache_key] = fn
        return fn

    def _install_object_sharding(self, mesh) -> None:
        """Object-parallel eval over a device mesh (the detection analogue of
        one_shot.py::_install_frame_sharding). The box-carry tracking prior
        makes the FRAME axis sequential (lax.scan carry), so the free data-
        parallel axis here is the OBJECT axis: per-object fine-tuned params,
        box carries, pseudo-GT labels, and PRNG keys shard over the mesh's
        first axis while the meta-params and the frame window broadcast.
        ``_eval_objects_batched`` pads the object count to a shard multiple
        (duplicating the last object; padded rows are discarded), so any
        multi-object sequence runs with every chip tracking its own
        object(s). This is a capability beyond the reference, whose eval
        binds one whole GPU per dataset (evaluate.py:20).

        shard_map (not in_shardings) on purpose: vmapping a conv over a
        per-object KERNEL axis lowers to a grouped convolution
        (feature_group_count=O), and the SPMD partitioner cannot split a
        grouped conv across its group axis (it produces an invalid
        groups/features combination). shard_map splits the object axis
        BEFORE tracing, so every shard compiles the plain per-object
        program with no cross-shard conv at all."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        axis = mesh.axis_names[0]
        self._shard_n = int(np.prod(list(mesh.shape.values())))
        rep = P()
        obj = P(axis)
        self._jit_ft_objs = jax.jit(
            shard_map(
                jax.vmap(self._fine_tune, in_axes=(None, 0, None, 0, None)),
                mesh=mesh,
                in_specs=(rep, obj, rep, obj, rep),
                out_specs=obj,
                check_vma=False,
            )
        )
        self._jit_window_objs = jax.jit(
            shard_map(
                jax.vmap(self._segment_window, in_axes=(0, None, 0, 0, 0)),
                mesh=mesh,
                in_specs=(obj, rep, obj, obj, obj),
                out_specs=obj,
                check_vma=False,
            )
        )
        self._jit_ona_ft_objs = jax.jit(
            shard_map(
                jax.vmap(self._ona_fine_tune,
                         in_axes=(None, 0, None, 0, None, 0, 0)),
                mesh=mesh,
                in_specs=(rep, obj, rep, obj, rep, obj, obj),
                out_specs=obj,
                check_vma=False,
            ),
            donate_argnums=(6,),
        )

    # -- fine-tune ----------------------------------------------------------

    def _loss_fn(self, params, batch):
        cfg = self.cfg
        key, img, label = batch
        k_aug, k_sample = jax.random.split(key)
        imgs, labels = transforms.augment_support_batch(
            k_aug, img.astype(jnp.float32), label, cfg.batch_size, cfg.augment
        )
        imgs = transforms.normalize(imgs, cfg.normalize_mode)
        masks = jnp.where(labels == 255, 255.0, labels.astype(jnp.float32))
        gt_masks = masks[:, None]  # [B,1,H,W] one object per group
        gt_valid = jnp.any((gt_masks == 1), axis=(2, 3))
        total, _ = self.model.apply(
            params,
            imgs,
            gt_masks,
            gt_valid,
            train=True,
            rngs={"sample": k_sample},
        )
        return total

    def _fine_tune(self, meta_params, key, img, label, init_params):
        cfg = self.cfg
        keys = jax.random.split(key, cfg.num_epochs)
        batches = (
            keys,
            jnp.broadcast_to(img, (cfg.num_epochs,) + img.shape),
            jnp.broadcast_to(label, (cfg.num_epochs,) + label.shape),
        )
        return fine_tune(
            self.meta_cfg,
            self._loss_fn,
            meta_params,
            batches,
            init_params=init_params,
            early_stop_patience=cfg.early_stop_patience,
        )

    def _ona_meta_params(self, meta_params: MetaParams) -> MetaParams:
        """OnA lr tree: only box/mask head updates when only_box_head
        (reference's partial-update switch, meta_optim.py:209-210)."""
        if not self.cfg.ona_only_box_head:
            return meta_params
        from e_osvos_tpu.meta_optim.lr_tree import LOG_LR_MIN, mask_lrs_by_path

        zero = LOG_LR_MIN if self.meta_cfg.use_log_init_lr else 0.0
        return meta_params._replace(
            log_init_lr=mask_lrs_by_path(
                meta_params.log_init_lr,
                ["box_head", "mask_head"],
                keep_matching=True,
                zero_value=zero,
            )
        )

    def _ona_loss_fn(self, params, batch):
        """OnA batch = ONE un-augmented support frame + the propagated
        pseudo-GT frames (evaluate.py:215-253 parity — the reference
        switches to ToTensor-only and takes inputs[:1])."""
        cfg = self.cfg
        if cfg.ona_only_box_head:
            # the lr mask (_ona_meta_params) already makes non-head updates
            # no-ops; stop_gradient additionally lets XLA skip the whole
            # backbone/FPN/RPN backward, which is what makes the restricted
            # mode FAST. (In the reference this restriction is inert: its
            # apply_param_groups_step_box_head filter is `if True:`,
            # meta_model.py:73-76, so it updates everything — our False
            # default matches that actual behavior.)
            def stop_non_head(path, leaf):
                name = jax.tree_util.keystr(path).lower()
                if "box_head" in name or "mask_head" in name:
                    return leaf
                return jax.lax.stop_gradient(leaf)

            params = jax.tree_util.tree_map_with_path(stop_non_head, params)
        key, img, label, prop_imgs, prop_labels = batch
        k_sample = key
        imgs = jnp.concatenate(
            [img.astype(jnp.float32)[None], prop_imgs.astype(jnp.float32)],
            axis=0,
        )
        labels = jnp.concatenate([label[None], prop_labels], axis=0)
        imgs = transforms.normalize(imgs, cfg.normalize_mode)
        masks = jnp.where(labels == 255, 255.0, labels.astype(jnp.float32))
        gt_masks = masks[:, None]
        gt_valid = jnp.any(gt_masks == 1, axis=(2, 3))
        total, _ = self.model.apply(
            params, imgs, gt_masks, gt_valid, train=True,
            rngs={"sample": k_sample},
        )
        return total

    def _ona_fine_tune(self, meta_params, key, img, label, prop_imgs,
                       prop_labels, init_params):
        cfg = self.cfg
        mp = self._ona_meta_params(meta_params)
        n = cfg.online_adapt_epochs
        keys = jax.random.split(key, n)
        batches = (
            keys,
            jnp.broadcast_to(img, (n,) + img.shape),
            jnp.broadcast_to(label, (n,) + label.shape),
            jnp.broadcast_to(prop_imgs, (n,) + prop_imgs.shape),
            jnp.broadcast_to(prop_labels, (n,) + prop_labels.shape),
        )
        return fine_tune(
            self.meta_cfg,
            self._ona_loss_fn,
            mp,
            batches,
            init_params=init_params,
            early_stop_patience=cfg.early_stop_patience,
            reset=(cfg.ona_reset_mode == "FULL"),
        )

    # -- propagation --------------------------------------------------------

    def _segment_window(self, params, frames, init_boxes, init_valid, key):
        """lax.scan over frames with previous-frame boxes as carry.

        frames [T,H,W,3] raw; init_boxes [K,4]. Returns (probs [T,H,W],
        boxes [T,K,4], valid [T,K], final_boxes [K,4], final_valid [K]) —
        the final carry seeds the next window without a host round-trip."""
        cfg = self.cfg

        def step(carry, inp):
            prev_boxes, prev_valid, k = carry
            frame = inp
            k, k_s = jax.random.split(k)
            img = transforms.normalize(
                frame.astype(jnp.float32), cfg.normalize_mode
            )[None]
            any_prev = jnp.any(prev_valid)
            det = self.model.apply(
                params,
                img,
                prev_boxes=prev_boxes[None],
                prev_valid=(prev_valid & any_prev)[None],
                proposal_aug_mode=cfg.proposal_aug_mode,
                rngs={"sample": k_s},
            )
            # merged fg probability over the K detections
            probs = jnp.max(det.masks[0], axis=0)
            # next-frame boxes from the predicted mask (helper_func.py:117-126)
            new_boxes, new_valid = masks_to_boxes(
                (det.masks[0] >= cfg.box_from_mask_thresh).astype(jnp.float32)
            )
            new_valid = new_valid & det.valid[0]
            # empty-mask fallback: keep previous boxes
            keep_prev = ~jnp.any(new_valid)
            boxes = jnp.where(keep_prev, prev_boxes, new_boxes)
            valid = jnp.where(keep_prev, prev_valid, new_valid)
            return (boxes, valid, k), (probs, det.boxes[0], det.valid[0])

        (fin_boxes, fin_valid, _), (probs, boxes, valid) = jax.lax.scan(
            step, (init_boxes, init_valid, key), frames
        )
        return probs, boxes, valid, fin_boxes, fin_valid

    # -- host driver ---------------------------------------------------------

    def eval_sequence(
        self,
        index,
        seq_name: str,
        meta_params: MetaParams,
        key,
        init_params: Any = None,
    ) -> Dict[str, Any]:
        from e_osvos_tpu.ops import metrics as metric_ops

        cfg = self.cfg
        from e_osvos_tpu.data.loader import load_frames

        seq = index.sequences[seq_name]
        T = len(seq)
        frames_np = load_frames(index, seq_name)
        h0, w0 = frames_np.shape[1], frames_np.shape[2]
        hw_dev = (
            transforms.bucket_hw(h0, w0, cfg.pad_multiple)
            if cfg.pad_multiple else (h0, w0)
        )
        groups = seq.object_groups
        # upload-overlap (see one_shot.py::eval_sequence): support frames
        # go up first so the fine-tune runs while the full stack streams
        sup_dev = {
            sf: jnp.asarray(_pad_frame_np(frames_np[sf], hw_dev))
            for sf in {g.support_frame for g in groups}
        }
        frames = jnp.asarray(frames_np)
        if cfg.pad_multiple:
            frames = transforms.pad_frames_to_multiple(frames, cfg.pad_multiple)
        K = self.model.roi.detections_per_img

        same_support = len({g.support_frame for g in groups}) == 1
        if self.batch_objects and len(groups) > 1 and same_support:
            probs = self._eval_objects_batched(
                index, seq, frames, meta_params, key, init_params,
                orig_hw=(h0, w0),
                support_img=sup_dev[groups[0].support_frame],
            )
            return self._score(index, seq_name, seq, T, probs[..., :h0, :w0])

        obj_probs = []
        for gi, group in enumerate(seq.object_groups):
            gkey = jax.random.fold_in(key, gi)
            sf = group.support_frame
            gt = index.get_label(seq_name, sf)
            label = transforms.pad_label_to(
                jnp.asarray(binarize_label(gt, group.object_ids), jnp.int32),
                frames.shape[1:3],
            )

            k_ft, k_win, k_ona = jax.random.split(gkey, 3)
            support_img = sup_dev[sf]
            params, _ = self._jit_ft(
                meta_params, k_ft, support_img, label, init_params
            )
            boxes0, valid0 = masks_to_boxes(
                (label == 1).astype(jnp.float32)[None]
            )
            boxes0 = jnp.tile(boxes0, (K, 1))[:K]
            valid0 = jnp.tile(valid0, (K,))[:K]

            probs = jnp.zeros((T,) + frames.shape[1:3], jnp.float32)
            probs = probs.at[sf].set((label == 1).astype(jnp.float32))

            if self.fused_ona and sf + 1 < T:
                windows, r, wn_real = stack_windows(
                    frames[sf + 1:], cfg.online_adapt_step,
                    cfg.ona_window_bucket,
                )
                wn = windows.shape[0]
                w_keys = jax.vmap(
                    lambda w: jax.random.fold_in(k_win, w)
                )(jnp.arange(wn))
                ona_keys = jax.vmap(
                    lambda w: jax.random.fold_in(k_ona, w)
                )(jnp.arange(wn))
                w_flat, _ = self._fused_propagate((h0, w0), batched=False)(
                    meta_params, support_img, label, windows, w_keys,
                    ona_keys, params, boxes0, valid0, jnp.int32(wn_real),
                )
                obj_probs.append(probs.at[sf + 1:].set(w_flat[:r]))
                continue

            # windowed propagation with optional online adaptation
            # (evaluate.py:141-253): re-fit on support + pseudo-GT between
            # windows of `online_adapt_step` frames
            step = cfg.online_adapt_step if cfg.online_adapt_step > 0 else T
            start = sf + 1
            boxes_c, valid_c = boxes0, valid0
            window_id = 0
            while start < T:
                end = min(start + step, T)
                k_run = jax.random.fold_in(k_win, window_id)
                w_probs, _, _, boxes_c, valid_c = self._jit_window(
                    params, frames[start:end], boxes_c, valid_c, k_run
                )
                probs = probs.at[start:end].set(w_probs)

                if cfg.online_adapt_step > 0 and end < T:
                    kk = min(cfg.online_adapt_step, cfg.batch_size)
                    sel = w_probs[-kk:]
                    pseudo = jnp.where(
                        sel >= cfg.online_adapt_min_prop,
                        1,
                        jnp.where(
                            sel <= 1.0 - cfg.online_adapt_min_prop, 0, 255
                        ),
                    ).astype(jnp.int32)
                    pseudo = pseudo_ignore_padding(pseudo, (h0, w0))
                    has_fg = jnp.any(pseudo == 1, axis=(1, 2))
                    pseudo = jnp.where(has_fg[:, None, None], pseudo, 255)
                    k_w = jax.random.fold_in(k_ona, window_id)
                    params, _ = self._jit_ona_ft(
                        meta_params, k_w, support_img, label,
                        frames[start:end][-kk:], pseudo, params,
                    )
                start = end
                window_id += 1
            obj_probs.append(probs)

        probs = jnp.stack(obj_probs)
        return self._score(index, seq_name, seq, T, probs[..., :h0, :w0])

    def eval_stream(
        self,
        index,
        seq_names,
        meta_params: MetaParams,
        key,
        init_params: Any = None,
    ) -> Dict[str, np.ndarray]:
        """Pipelined one-shot tracking over many sequences (serving mode;
        single object group per sequence) — the detection mirror of
        one_shot.py::eval_stream.

        Every sequence's fine-tune → box-carry propagation (→ fused OnA
        refits when ``online_adapt_step`` > 0) is dispatched before ANY
        result is fetched: jax dispatch is asynchronous, so sequence k+1's
        [T,H,W,3] upload streams while sequence k computes, and only
        bit-packed masks (8 px/byte, ops/bits.py) cross back, drained in
        order at the end. The key schedule replicates eval_sequence's
        serial path (per-sequence fold, group-0 fold, the ft/window/OnA
        split, per-window folds), so stream(key) row i equals
        eval_sequence(fold_in(key, i)) on the fused path bit-exactly.
        Returns {name: uint8 [T,H,W]} with the support row replaced by GT
        (frame 0 is given under the DAVIS protocol, evaluate.py:123)."""
        from e_osvos_tpu.data.loader import load_frames
        from e_osvos_tpu.ops.bits import pack_mask_bits, unpack_mask_bits

        cfg = self.cfg
        K = self.model.roi.detections_per_img
        if self._jit_pack is None:
            self._jit_pack = jax.jit(
                lambda p: pack_mask_bits(p >= cfg.threshold)
            )
        if self._jit_stream_prep is None:
            def _prep(label):
                b0, v0 = masks_to_boxes(
                    (label == 1).astype(jnp.float32)[None]
                )
                return jnp.tile(b0, (K, 1))[:K], jnp.tile(v0, (K,))[:K]

            self._jit_stream_prep = jax.jit(_prep)

        pend = []
        for i, name in enumerate(seq_names):
            seq = index.sequences[name]
            group = seq.object_groups[0]
            sf = group.support_frame
            frames_np = load_frames(index, name)
            T, h0, w0 = frames_np.shape[:3]
            gt_bin = binarize_label(index.get_label(name, sf),
                                    group.object_ids)
            # support frame + label first (small uploads): the fine-tune
            # dispatches and runs while the full stack streams up
            sup = jnp.asarray(frames_np[sf])
            label = jnp.asarray(gt_bin, jnp.int32)
            frames_j = jnp.asarray(frames_np)
            gkey = jax.random.fold_in(jax.random.fold_in(key, i), 0)
            k_ft, k_win, k_ona = jax.random.split(gkey, 3)
            params, _ = self._jit_ft(meta_params, k_ft, sup, label,
                                     init_params)
            boxes0, valid0 = self._jit_stream_prep(label)
            if sf + 1 >= T:
                pend.append((name, sf, gt_bin, None, (T, h0, w0)))
                continue
            if cfg.online_adapt_step > 0:
                windows, r, wn_real = stack_windows(
                    frames_j[sf + 1:], cfg.online_adapt_step,
                    cfg.ona_window_bucket,
                )
                wn = windows.shape[0]
                w_keys = jax.vmap(
                    lambda w: jax.random.fold_in(k_win, w)
                )(jnp.arange(wn))
                ona_keys = jax.vmap(
                    lambda w: jax.random.fold_in(k_ona, w)
                )(jnp.arange(wn))
                w_flat, _ = self._fused_propagate((h0, w0), batched=False)(
                    meta_params, sup, label, windows, w_keys, ona_keys,
                    params, boxes0, valid0, jnp.int32(wn_real),
                )
                packed = self._jit_pack(w_flat[:r])
            else:
                # no OnA: the whole remainder is one window (the host
                # loop's step = T fallback), one scan program
                k_run = jax.random.fold_in(k_win, 0)
                w_probs = self._jit_window(
                    params, frames_j[sf + 1:], boxes0, valid0, k_run
                )[0]
                packed = self._jit_pack(w_probs)
            pend.append((name, sf, gt_bin, packed, (T, h0, w0)))

        out = {}
        for name, sf, gt_bin, packed, (T, h0, w0) in pend:
            mask = np.zeros((T, h0, w0), np.uint8)
            mask[sf] = (gt_bin == 1).astype(np.uint8)
            if packed is not None:
                mask[sf + 1:] = unpack_mask_bits(np.asarray(packed), w0)
            out[name] = mask
        return out

    def eval_sequence_init(
        self,
        index,
        seq_name: str,
        meta_params: MetaParams,
        init_params: Any = None,
    ) -> Dict[str, Any]:
        """init_J for the detection path (reference evaluate.py:123-127):
        the raw initialization tracks the sequence with the box-carry
        proposal prior but NO fine-tune and NO online adaptation. Windows
        reuse the same compiled `_jit_window` program as the adapted eval."""
        from e_osvos_tpu.data.loader import load_frames

        cfg = self.cfg
        seq = index.sequences[seq_name]
        T = len(seq)
        frames = jnp.asarray(load_frames(index, seq_name))
        h0, w0 = frames.shape[1], frames.shape[2]
        if cfg.pad_multiple:
            frames = transforms.pad_frames_to_multiple(frames, cfg.pad_multiple)
        K = self.model.roi.detections_per_img
        params = init_params if init_params is not None else meta_params.model_init
        if params is None:
            raise ValueError(
                "eval_sequence_init needs init_params when the meta "
                "checkpoint has no learned model init"
            )

        obj_probs = []
        for gi, group in enumerate(seq.object_groups):
            sf = group.support_frame
            gt = index.get_label(seq_name, sf)
            label = transforms.pad_label_to(
                jnp.asarray(binarize_label(gt, group.object_ids), jnp.int32),
                frames.shape[1:3],
            )
            boxes0, valid0 = masks_to_boxes(
                (label == 1).astype(jnp.float32)[None]
            )
            boxes0 = jnp.tile(boxes0, (K, 1))[:K]
            valid0 = jnp.tile(valid0, (K,))[:K]

            probs = jnp.zeros((T,) + frames.shape[1:3], jnp.float32)
            probs = probs.at[sf].set((label == 1).astype(jnp.float32))
            step = cfg.online_adapt_step if cfg.online_adapt_step > 0 else T
            start, boxes_c, valid_c, window_id = sf + 1, boxes0, valid0, 0
            k_win = jax.random.fold_in(jax.random.PRNGKey(0), gi)
            while start < T:
                end = min(start + step, T)
                k_run = jax.random.fold_in(k_win, window_id)
                w_probs, _, _, boxes_c, valid_c = self._jit_window(
                    params, frames[start:end], boxes_c, valid_c, k_run
                )
                probs = probs.at[start:end].set(w_probs)
                start, window_id = end, window_id + 1
            obj_probs.append(probs)

        res = self._score(
            index, seq_name, seq, T, jnp.stack(obj_probs)[..., :h0, :w0]
        )
        return {
            "seq": seq_name,
            "init_J_mean": res["J_mean"],
            "init_F_mean": res["F_mean"],
        }

    def _eval_objects_batched(
        self, index, seq, frames, meta_params: MetaParams, key, init_params,
        orig_hw=None, support_img=None,
    ):
        """All object groups fine-tuned, tracked, and OnA-refit in ONE
        vmapped program (per-object params + box carries); requires a
        shared support frame. Returns [O,T,H,W] probabilities."""
        cfg = self.cfg
        groups = seq.object_groups
        O_real = len(groups)
        T = frames.shape[0]
        K = self.model.roi.detections_per_img
        sf = groups[0].support_frame
        if support_img is None:
            support_img = frames[sf]
        gt = index.get_label(seq.name, sf)
        labels = jnp.asarray(
            np.stack([binarize_label(gt, g.object_ids) for g in groups]),
            jnp.int32,
        )  # [O,H,W]
        labels = jax.vmap(
            lambda l: transforms.pad_label_to(l, frames.shape[1:3])
        )(labels)
        if self._shard_n:
            # pad the object axis to a shard multiple (duplicate the last
            # object; the padded rows are discarded before scoring)
            pad = (-O_real) % self._shard_n
            if pad:
                labels = jnp.concatenate(
                    [labels,
                     jnp.broadcast_to(labels[-1:], (pad,) + labels.shape[1:])],
                    axis=0,
                )
        O = labels.shape[0]
        # per-purpose base keys first, then fold (window_id, object) into
        # separate fold_in calls — a shared linear encoding (1000+w*64+i)
        # aliases across purposes/long sequences/O>64
        k_ft, k_win, k_ona = jax.random.split(key, 3)
        keys = jax.vmap(lambda i: jax.random.fold_in(k_ft, i))(jnp.arange(O))

        params_o, _ = self._jit_ft_objs(
            meta_params, keys, support_img, labels, init_params
        )
        nb, nv = masks_to_boxes((labels == 1).astype(jnp.float32))  # [O,4],[O]
        boxes_c = jnp.tile(nb[:, None], (1, K, 1))  # [O,K,4]
        valid_c = jnp.tile(nv[:, None], (1, K))

        probs = jnp.zeros((O, T) + frames.shape[1:3], jnp.float32)
        probs = probs.at[:, sf].set((labels == 1).astype(jnp.float32))

        if self.fused_ona and sf + 1 < T:
            windows, r, wn_real = stack_windows(
                frames[sf + 1:], cfg.online_adapt_step,
                cfg.ona_window_bucket,
            )
            wn = windows.shape[0]
            # keys match the host loop: fold window id into the per-purpose
            # base, then the object id — [O, Wn] per purpose
            w_keys = jax.vmap(jax.vmap(
                lambda w, o: jax.random.fold_in(
                    jax.random.fold_in(k_win, w), o
                ), in_axes=(0, None)), in_axes=(None, 0),
            )(jnp.arange(wn), jnp.arange(O))
            ona_keys = jax.vmap(jax.vmap(
                lambda w, o: jax.random.fold_in(
                    jax.random.fold_in(k_ona, w), o
                ), in_axes=(0, None)), in_axes=(None, 0),
            )(jnp.arange(wn), jnp.arange(O))
            w_flat, _ = self._fused_propagate(orig_hw, batched=True)(
                meta_params, support_img, labels, windows, w_keys,
                ona_keys, params_o, boxes_c, valid_c, jnp.int32(wn_real),
            )  # [O, Wn*step, H, W]
            probs = probs.at[:, sf + 1:].set(w_flat[:, :r])
            return probs[:O_real]

        step = cfg.online_adapt_step if cfg.online_adapt_step > 0 else T
        start = sf + 1
        window_id = 0
        while start < T:
            end = min(start + step, T)
            kw_base = jax.random.fold_in(k_win, window_id)
            k_run = jax.vmap(
                lambda i: jax.random.fold_in(kw_base, i)
            )(jnp.arange(O))
            w_probs, _, _, boxes_c, valid_c = self._jit_window_objs(
                params_o, frames[start:end], boxes_c, valid_c, k_run
            )  # [O,w,H,W]
            probs = probs.at[:, start:end].set(w_probs)

            if cfg.online_adapt_step > 0 and end < T:
                kk = min(cfg.online_adapt_step, cfg.batch_size)
                sel = w_probs[:, -kk:]
                pseudo = jnp.where(
                    sel >= cfg.online_adapt_min_prop,
                    1,
                    jnp.where(sel <= 1.0 - cfg.online_adapt_min_prop, 0, 255),
                ).astype(jnp.int32)
                pseudo = pseudo_ignore_padding(pseudo, orig_hw)
                has_fg = jnp.any(pseudo == 1, axis=(2, 3))
                pseudo = jnp.where(has_fg[:, :, None, None], pseudo, 255)
                ko_base = jax.random.fold_in(k_ona, window_id)
                k_w = jax.vmap(
                    lambda i: jax.random.fold_in(ko_base, i)
                )(jnp.arange(O))
                params_o, _ = self._jit_ona_ft_objs(
                    meta_params, k_w, support_img, labels,
                    frames[start:end][-kk:], pseudo, params_o,
                )
            start = end
            window_id += 1
        return probs[:O_real]

    def _score(self, index, seq_name, seq, T, probs):
        """Score + materialize results with TWO device fetches total: the
        [O,T] J/F arrays and the bit-packed merged planes. The previous
        eager loop (2 metric dispatches + full-res transfers per frame per
        object, then an fp32 probs fetch) was 42% of the all-in sequence
        time under the tunnel (BENCH_DET_ATTRIB.json). ``probs`` is
        returned as the device array — converting it is the (untimed)
        caller's choice, not a cost every eval pays."""
        from e_osvos_tpu.engine.one_shot import (
            _pack_planes_jit,
            score_merged_device,
        )
        from e_osvos_tpu.ops.bits import unpack_mask_bits

        cfg = self.cfg
        merged = merge_objects(probs, cfg.threshold)
        n_obj = len(seq.object_groups)
        j_means, f_means, _ = score_merged_device(index, seq_name, seq, merged)

        packed = np.asarray(_pack_planes_jit(merged, n_obj))
        # unpack returns uint8 — cast to bool or the fancy-indexing below
        # silently becomes integer indexing (wrong and ~1000x slower)
        planes = unpack_mask_bits(packed, merged.shape[-1]).astype(bool)
        merged_np = np.zeros(merged.shape, np.uint8)
        for gi in range(n_obj):
            merged_np[planes[gi]] = gi + 1

        return {
            "seq": seq_name,
            "merged": merged_np,
            "probs": probs,
            "J_per_object": j_means,
            "F_per_object": f_means,
            "J_mean": float(np.nanmean(j_means)) if j_means else float("nan"),
            "F_mean": float(np.nanmean(f_means)) if f_means else float("nan"),
        }
