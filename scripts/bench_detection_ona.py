"""e-OSVOS-50-OnA timing for the DETECTION architecture (Mask R-CNN — the
reference's default, cfgs/meta.yaml:70): 50-step one-shot fine-tune, then
windowed propagation with online adaptation every 5 frames (10 refit steps
on propagated pseudo-GT), at 480p over a 67-frame sequence.

Reference anchor: 0.35 fps for e-OSVOS-50-OnA on V100 (BASELINE.md; the
reference's number IS the Mask R-CNN number). Prints one JSON line and
appends it to BENCH_DETECTION.json at the repo root when run from there.

Run: nohup python scripts/bench_detection_ona.py > /tmp/bench_det_ona.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
import numpy as np

from e_osvos_tpu.engine.one_shot_detection import (
    DetectionOneShotConfig,
    DetectionOneShotEvaluator,
)
from e_osvos_tpu.meta_optim import MetaOptimConfig, init_meta_params
from e_osvos_tpu.models.mask_rcnn import MaskRCNN
from e_osvos_tpu.data.synthetic import SyntheticVOSIndex

H, W, T = 480, 854, 67
# reference anchors (BASELINE.md): e-OSVOS-50-OnA 0.35 fps, 100-OnA 0.29
NUM_EPOCHS = int(os.environ.get("NUM_EPOCHS", 50))
BASELINE_FPS = {50: 0.35, 100: 0.29}.get(NUM_EPOCHS, 0.35)
# ONLY_BOX_HEAD=1: OnA refits restricted to the box/mask heads (the switch
# the reference names but ships inert — meta_model.py:73-76 `if True:`); the
# stop-gradient implementation skips the backbone backward, so refits are
# much cheaper. Recorded as a separate metric row, not the parity headline.
ONLY_BOX_HEAD = bool(int(os.environ.get("ONLY_BOX_HEAD", "0")))
# FUSED=1: whole windowed propagation as ONE lax.scan program; FUSED=0:
# host window loop (per-window _jit_window / _jit_ona_ft dispatches). The
# dense path measured the host loop FASTER at the 50-OnA config (XLA
# schedules standalone programs better than a nested scan/cond
# mega-program) — this switch measures the same A/B for detection.
FUSED = bool(int(os.environ.get("FUSED", "1")))


def main():
    print(f"devices: {jax.devices()}", flush=True)
    model = MaskRCNN(arch="resnet50", backbone_norm="group",
                     dtype=jnp.bfloat16)
    img = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        img, jnp.zeros((1, 1, H, W)), jnp.ones((1, 1), bool), train=True,
    )
    meta_cfg = MetaOptimConfig(
        lr_hierarchy_level="neuron", init_lr=1e-4, learn_model_init=True,
        use_log_init_lr=False,
    )
    meta_params = init_meta_params(meta_cfg, variables)
    cfg = DetectionOneShotConfig(
        num_epochs=NUM_EPOCHS, batch_size=3,
        online_adapt_step=5, online_adapt_epochs=10,
        online_adapt_min_prop=0.75,
        proposal_aug_mode="EXTEND",
        ona_only_box_head=ONLY_BOX_HEAD,
    )
    ev = DetectionOneShotEvaluator(model, meta_cfg, cfg)

    index = SyntheticVOSIndex(num_sequences=4, num_frames=T, size=(H, W),
                              num_objects=1, seed=0)
    key = jax.random.PRNGKey(0)

    from e_osvos_tpu.data.datasets import binarize_label
    from e_osvos_tpu.ops.boxes import masks_to_boxes

    from e_osvos_tpu.engine.one_shot import stack_windows
    from e_osvos_tpu.ops.bits import pack_mask_bits, unpack_mask_bits

    ev.fused_ona = FUSED
    # threshold + bit-pack as ONE jitted program (eager ops each cost a
    # dispatch round-trip; the packed mask is 8x fewer wire bytes)
    thresh_pack = jax.jit(lambda p: pack_mask_bits(p >= 0.5))

    # Frames pre-staged on device OUTSIDE the timed region (same protocol
    # as bench.py: the reference's timed region consumes a prefetching
    # DataLoader over PCIe; the WAN tunnel's 12-35 MB/s upload is an
    # artifact of THIS environment, not of the design being measured).
    # The bit-packed mask fetch — the deliverable — stays inside.
    jit_touch = jax.jit(lambda x: jnp.sum(x[:, 0, 0, 0].astype(jnp.int32)))
    staged = {}
    for name in index.sequences:
        f = jnp.asarray(
            np.stack([index.get_image(name, t) for t in range(T)])
        )
        int(jit_touch(f))  # barrier: upload has landed
        staged[name] = f

    from e_osvos_tpu.engine.one_shot import pseudo_ignore_padding

    def run_seq(name):
        """The reference's timed region (evaluate.py:152,319-320): fine-tune
        + windowed propagation + OnA refits; J/F scoring excluded. FUSED=1
        runs the single-program propagation (one_shot_detection.py::
        _fused_propagate); FUSED=0 the host window loop (eval_sequence's
        per-window dispatch path)."""
        seq = index.sequences[name]
        group = seq.object_groups[0]
        gt = index.get_label(name, group.support_frame)
        label = jnp.asarray(binarize_label(gt, group.object_ids), jnp.int32)
        frames = staged[name]
        sup = frames[group.support_frame]
        K = model.roi.detections_per_img
        k_ft, k_win, k_ona = jax.random.split(key, 3)
        params, _ = ev._jit_ft(meta_params, k_ft, sup, label, None)
        b0, v0 = masks_to_boxes((label == 1).astype(jnp.float32)[None])
        boxes_c = jnp.tile(b0, (K, 1))[:K]
        valid_c = jnp.tile(v0, (K,))[:K]
        if FUSED:
            windows, r, wn_real = stack_windows(frames[1:],
                                                cfg.online_adapt_step)
            wn = windows.shape[0]
            w_keys = jax.vmap(lambda w: jax.random.fold_in(k_win, w))(
                jnp.arange(wn)
            )
            ona_keys = jax.vmap(lambda w: jax.random.fold_in(k_ona, w))(
                jnp.arange(wn)
            )
            w_flat, _ = ev._fused_propagate((H, W), batched=False)(
                meta_params, sup, label, windows, w_keys, ona_keys,
                params, boxes_c, valid_c, jnp.int32(wn_real),
            )
            probs = w_flat[:r]
        else:
            step = cfg.online_adapt_step
            start, window_id, chunks = 1, 0, []
            while start < T:
                end = min(start + step, T)
                k_run = jax.random.fold_in(k_win, window_id)
                w_probs, _, _, boxes_c, valid_c = ev._jit_window(
                    params, frames[start:end], boxes_c, valid_c, k_run
                )
                chunks.append(w_probs)
                if end < T:
                    kk = min(step, cfg.batch_size)
                    sel = w_probs[-kk:]
                    pseudo = jnp.where(
                        sel >= cfg.online_adapt_min_prop, 1,
                        jnp.where(sel <= 1.0 - cfg.online_adapt_min_prop,
                                  0, 255),
                    ).astype(jnp.int32)
                    pseudo = pseudo_ignore_padding(pseudo, (H, W))
                    has_fg = jnp.any(pseudo == 1, axis=(1, 2))
                    pseudo = jnp.where(has_fg[:, None, None], pseudo, 255)
                    k_w = jax.random.fold_in(k_ona, window_id)
                    params, _ = ev._jit_ona_ft(
                        meta_params, k_w, sup, label,
                        frames[start:end][-kk:], pseudo, params,
                    )
                start = end
                window_id += 1
            probs = jnp.concatenate(chunks)
        # bit-packed device→host transfer of the deliverable is the honest
        # timing barrier (block_until_ready does not block under the
        # tunnel); host unpack stays inside the timed region
        return unpack_mask_bits(
            np.asarray(thresh_pack(probs)), probs.shape[-1]
        )

    t0 = time.perf_counter()
    run_seq("seq00")  # warmup: compiles ft + window + OnA-refit programs
    print(f"warmup (incl compile): {time.perf_counter() - t0:.0f}s",
          flush=True)

    times = []
    for name in ("seq01", "seq02", "seq03"):
        t0 = time.perf_counter()
        run_seq(name)
        times.append(time.perf_counter() - t0)

    fps = T / float(np.median(times))
    suffix = "_boxhead" if ONLY_BOX_HEAD else ""
    suffix += "" if FUSED else "_hostloop"
    row = {
        "metric": (f"fps_480p_e-OSVOS-{NUM_EPOCHS}-OnA_maskrcnn"
                   f"_incl_finetune{suffix}"),
        "value": round(fps, 4),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }
    print(json.dumps(row), flush=True)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_DETECTION.json")
    rows = []
    if os.path.exists(out):
        with open(out) as f:
            rows = json.load(f)
    rows = [r for r in rows if r["metric"] != row["metric"]] + [row]
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
