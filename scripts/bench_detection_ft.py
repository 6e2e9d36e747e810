"""Timing of the Mask R-CNN one-shot fine-tune at 480p (the e-OSVOS-10 cost
driver) plus the end-to-end sequence figure.

Measures: one jitted 10-step fine-tune (batch 3, augmented support batches,
remat scan), then the full eval_sequence-style loop on synthetic frames:
fps = T / (fine_tune + T_frames · frame_step) — the reference's headline
timing (evaluate.py:152,319-320,436).

Run: nohup python scripts/bench_detection_ft.py > /tmp/bench_det_ft.log 2>&1 &
"""

from __future__ import annotations

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
from e_osvos_tpu.ops.boxes import masks_to_boxes

H, W, T = 480, 864, 67
# reference anchors per fine-tune step count (BASELINE.md: cell-3 fps for
# e-OSVOS-10/50; T=100 from the cell-5 sweep, 0.69 s/frame)
FT_STEPS = int(os.environ.get("FT_STEPS", 10))
ANCHOR_FPS = {10: 5.3, 50: 1.64, 100: 1.45}.get(FT_STEPS, 5.3)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    model = MaskRCNN(arch="resnet50", backbone_norm="group", dtype=jnp.bfloat16)
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
        num_epochs=FT_STEPS, batch_size=3, online_adapt_step=0,
        early_stop_patience=0,
    )
    ev = DetectionOneShotEvaluator(model, meta_cfg, cfg)

    rs = np.random.RandomState(0)
    frame = jnp.asarray(rs.rand(H, W, 3) * 255, jnp.float32)
    label = jnp.zeros((H, W), jnp.int32).at[100:300, 200:500].set(1)

    # --- fine-tune timing ---------------------------------------------------
    k = jax.random.PRNGKey(42)
    params, losses = ev._jit_ft(meta_params, k, frame, label, None)
    np.asarray(losses)  # barrier
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        params, losses = ev._jit_ft(meta_params, k, frame, label, None)
        np.asarray(losses)
        best = min(best, time.perf_counter() - t0)
    ft_time = best
    print(f"fine-tune ({FT_STEPS} steps, batch 3): {ft_time:.3f} s "
          f"= {ft_time / FT_STEPS * 1e3:.1f} ms/step", flush=True)

    # --- window propagation timing -------------------------------------------
    frames = jnp.asarray(rs.rand(T, H, W, 3) * 255, jnp.float32)
    K = model.roi.detections_per_img
    b0, v0 = masks_to_boxes((label == 1).astype(jnp.float32)[None])
    boxes0 = jnp.tile(b0, (K, 1))[:K]
    valid0 = jnp.tile(v0, (K,))[:K]
    kr = jax.random.PRNGKey(7)
    probs, _, _, boxes, valid = ev._jit_window(params, frames, boxes0, valid0, kr)
    np.asarray(probs[-1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        probs, _, _, _, _ = ev._jit_window(params, frames, boxes0, valid0, kr)
        # transfer the uint8-equivalent deliverable like bench.py
        np.asarray((probs >= 0.5).astype(jnp.uint8))
        best = min(best, time.perf_counter() - t0)
    win_time = best
    per_frame = win_time / T
    print(f"propagation: {win_time:.3f} s for {T} frames "
          f"= {per_frame * 1e3:.1f} ms/frame", flush=True)

    total = ft_time + win_time
    fps = T / total
    print(f"e-OSVOS-{FT_STEPS} end-to-end: {total:.2f} s for {T} frames "
          f"= {fps:.2f} fps (reference V100: {ANCHOR_FPS} fps)", flush=True)

    import json

    row = {
        "metric": f"fps_480p_e-OSVOS-{FT_STEPS}_maskrcnn_incl_finetune",
        "value": round(fps, 4),
        "unit": "frames/sec",
        "vs_baseline": round(fps / ANCHOR_FPS, 3),
    }
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
