"""Detection (Mask R-CNN) all-in fps attribution (VERDICT r4 weak #3).

The CLI disk-protocol warm pass runs the reference-default architecture
(mask_rcnn.py:425, cfgs/meta.yaml:70) at 0.46-0.47 fps all-in — below the
>=1.75 fps north-star bar the dense path clears 4x — and nothing in
PERF.md attributed where the time goes. This decomposes one warm
66-frame 480p e-OSVOS-50-OnA sequence into separately-timed phases, each
behind a device->host barrier (np.asarray; block_until_ready does not
block under the axon tunnel — repo CLAUDE.md):

  upload       frames -> device + pad-to-multiple
  finetune1    1-epoch fine-tune program (per-sequence constant)
  finetune50   50-epoch initial fine-tune (slope => per-epoch cost)
  windows      box-carry scan inference over all 13 windows, NO refits
  fused_full   the production fused program (inference + 12 OnA refits)
  score        native J/F scoring + transfer
  backbone     single-frame resnet50+FPN features (micro: conv share)
  frame1/5     1- vs 5-frame _jit_window (micro: per-frame marginal vs
               per-call overhead inside the window program)

Writes BENCH_DET_ATTRIB.json. Run on the real chip AFTER the main queue
(shares the bench compile cache):
  nohup python scripts/bench_det_attrib.py > /tmp/det_attrib.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

H, W, T_FRAMES = 480, 854, 66
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def barrier(x):
    leaves = jax.tree_util.tree_leaves(x)
    np.asarray(leaves[0])
    return x


def timed(fn, reps=3):
    """Median wall seconds over ``reps`` warm calls (fn must barrier)."""
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def copy_tree(t):
    return jax.tree_util.tree_map(jnp.copy, t)


def main():
    import dataclasses as _dc

    from e_osvos_tpu.data import transforms
    from e_osvos_tpu.data.datasets import binarize_label
    from e_osvos_tpu.data.loader import load_frames
    from e_osvos_tpu.data.synthetic import SyntheticVOSIndex
    from e_osvos_tpu.data.transforms import AugmentConfig
    from e_osvos_tpu.engine.one_shot import stack_windows
    from e_osvos_tpu.engine.one_shot_detection import (
        DetectionOneShotConfig,
        DetectionOneShotEvaluator,
    )
    from e_osvos_tpu.meta_optim import MetaOptimConfig, init_meta_params
    from e_osvos_tpu.models import MaskRCNN, RoIConfig, RPNConfig
    from e_osvos_tpu.ops.boxes import masks_to_boxes

    # the disk-protocol CLI configuration (tpu_e2e_disk_480p.py maskrcnn
    # rows): resnet50 / GroupNorm / bf16, single_id (detections_per_img=1)
    model = MaskRCNN(
        arch="resnet50", backbone_norm="group", dtype=jnp.bfloat16,
        rpn=RPNConfig(), roi=RoIConfig(detections_per_img=1),
    )
    meta_cfg = MetaOptimConfig(init_lr=1e-3, use_log_init_lr=False)
    cfg = DetectionOneShotConfig(
        num_epochs=50, batch_size=3, online_adapt_step=5,
        online_adapt_epochs=10, online_adapt_min_prop=0.75,
        augment=AugmentConfig(), pad_multiple=64,
    )
    ev = DetectionOneShotEvaluator(model, meta_cfg, cfg)
    ev1 = DetectionOneShotEvaluator(  # 1-epoch twin for the ft slope
        model, meta_cfg, _dc.replace(cfg, num_epochs=1)
    )

    index = SyntheticVOSIndex(num_sequences=1, num_frames=T_FRAMES,
                              size=(H, W), num_objects=1, seed=0)
    name = list(index.sequences)[0]
    seq = index.sequences[name]
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, H, W, 3), jnp.float32),
    )
    meta_params = init_meta_params(meta_cfg, variables)
    key = jax.random.PRNGKey(0)

    frames_np = load_frames(index, name)
    result = {"experiment": "det_attrib_480p",
              "protocol": "e-OSVOS-50-OnA single_id, 66 frames 480x854",
              "phases_s": {}, "micro_s": {}}

    def record(group, label, secs):
        result[group][label] = round(secs, 4)
        print(f"{label}: {secs:.3f} s", flush=True)

    # ---- upload ----
    def do_upload():
        f = jnp.asarray(frames_np)
        f = transforms.pad_frames_to_multiple(f, cfg.pad_multiple)
        return barrier(f)

    frames = do_upload()
    record("phases_s", "upload", timed(do_upload))
    hw = frames.shape[1:3]

    gt = index.get_label(name, 0)
    label = transforms.pad_label_to(
        jnp.asarray(binarize_label(gt, seq.object_groups[0].object_ids),
                    jnp.int32), hw)
    support = frames[0]

    # ---- fine-tune ----
    k_ft = jax.random.fold_in(key, 1)
    params, _ = barrier(ev._jit_ft(meta_params, k_ft, support, label, None))
    record("phases_s", "finetune50",
           timed(lambda: barrier(
               ev._jit_ft(meta_params, k_ft, support, label, None))))
    barrier(ev1._jit_ft(meta_params, k_ft, support, label, None))
    record("phases_s", "finetune1",
           timed(lambda: barrier(
               ev1._jit_ft(meta_params, k_ft, support, label, None))))

    K = model.roi.detections_per_img
    boxes0, valid0 = masks_to_boxes((label == 1).astype(jnp.float32)[None])
    boxes0 = jnp.tile(boxes0, (K, 1))[:K]
    valid0 = jnp.tile(valid0, (K,))[:K]

    # ---- windowed inference, no refits (host loop over _jit_window) ----
    windows, r, wn_real = stack_windows(
        frames[1:], cfg.online_adapt_step, cfg.ona_window_bucket)
    wn = windows.shape[0]

    def do_windows():
        b, v = boxes0, valid0
        p = params
        out = None
        for i in range(wn):
            w_probs, _, _, b, v = ev._jit_window(
                p, windows[i], b, v, jax.random.fold_in(key, 100 + i))
            out = w_probs
        return barrier(out)

    do_windows()
    record("phases_s", "windows_no_refit", timed(do_windows))

    # ---- the production fused program ----
    w_keys = jax.vmap(lambda w: jax.random.fold_in(key, w))(jnp.arange(wn))
    ona_keys = jax.vmap(
        lambda w: jax.random.fold_in(key, 1000 + w))(jnp.arange(wn))
    prop = ev._fused_propagate((H, W), batched=False)

    def do_fused():
        p = copy_tree(params)  # donated arg
        flat, _ = prop(meta_params, support, label, windows, w_keys,
                       ona_keys, p, boxes0, valid0, jnp.int32(wn_real))
        return barrier(flat)

    flat = do_fused()
    record("phases_s", "fused_full", timed(do_fused))

    # ---- scoring ----
    probs = jnp.zeros((1, T_FRAMES) + tuple(hw), jnp.float32)
    probs = probs.at[0, 1:].set(flat[:r])
    probs = probs.at[0, 0].set((label == 1).astype(jnp.float32))

    def do_score():
        return ev._score(index, name, seq, T_FRAMES, probs[..., :H, :W])

    do_score()
    record("phases_s", "score", timed(do_score))

    # ---- micro: conv share vs detection-machinery share ----
    feat_fn = jax.jit(lambda v, x: model.apply(
        v, x, method=lambda m, im: m._features(im)))
    x1 = frames[:1]
    barrier(feat_fn(params, x1))
    record("micro_s", "backbone_fpn_1frame",
           timed(lambda: barrier(feat_fn(params, x1))))

    for nf in (1, 5):
        wnf = windows[0][:nf]
        barrier(ev._jit_window(params, wnf, boxes0, valid0, key))
        record("micro_s", f"window_{nf}frame",
               timed(lambda w=wnf: barrier(
                   ev._jit_window(params, w, boxes0, valid0, key))))

    # ---- reconstruction + headline ----
    ph = result["phases_s"]
    allin = ph["upload"] + ph["finetune50"] + ph["fused_full"] + ph["score"]
    result["reconstructed_allin_s"] = round(allin, 3)
    result["reconstructed_fps"] = round(T_FRAMES / allin, 3)
    result["refit_share_s"] = round(
        ph["fused_full"] - ph["windows_no_refit"], 3)
    mi = result["micro_s"]
    result["per_frame_marginal_s"] = round(
        (mi["window_5frame"] - mi["window_1frame"]) / 4, 4)
    result["per_ft_epoch_s"] = round(
        (ph["finetune50"] - ph["finetune1"]) / 49, 4)
    with open(os.path.join(REPO, "BENCH_DET_ATTRIB.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1), flush=True)


if __name__ == "__main__":
    main()
