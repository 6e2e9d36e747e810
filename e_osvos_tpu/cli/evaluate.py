"""One-shot evaluation CLI (the rebuild of the reference's eval-only
invocation, /root/reference/README.md:76-83 → src/util/evaluate.py).

Usage:
  python -m e_osvos_tpu.cli.evaluate with DAVIS-2017 e-OSVOS-OnA \
      num_epochs.eval=50 meta_optim_model_file=models/best.ckpt

Writes per-sequence J/F to metrics.jsonl and (optionally) indexed-PNG
predictions for DAVIS/YT-VOS submission (save_preds=<dir>).
"""

from __future__ import annotations

import os
import sys

import jax
import numpy as np

from e_osvos_tpu import config as cfglib
from e_osvos_tpu.cli.common import (
    build_indexes,
    build_parent_model,
    build_parent_state_selector,
    init_model_params,
    resolve_meta_params,
)
from e_osvos_tpu.engine.one_shot import OneShotEvaluator
from e_osvos_tpu.engine.one_shot_detection import (
    DetectionOneShotConfig,
    DetectionOneShotEvaluator,
)
from e_osvos_tpu.utils import MetricsLogger, Timer
from e_osvos_tpu.utils.png import save_indexed_png


def build_evaluator(cfg, model):
    """Dense (DeepLab) vs detection (Mask R-CNN) one-shot evaluator,
    dispatched on parent_model.architecture like the reference's
    init_parent_model (helper_func.py:339-357)."""
    import dataclasses as _dc

    meta_cfg = cfglib.to_meta_optim_config(cfg)
    one_shot_cfg = cfglib.to_one_shot_config(cfg)
    mesh = None
    if cfg.get("eval_frame_parallel"):
        # multi-chip eval: the dense path shards the inference FRAME axis
        # (one_shot.py::_install_frame_sharding); the detection path's frame
        # axis is sequential (box-carry scan), so it shards the OBJECT axis
        # instead (one_shot_detection.py::_install_object_sharding)
        from e_osvos_tpu.parallel import make_mesh

        mesh = make_mesh()
    arch = cfg.get("parent_model", {}).get("architecture", "DeepLabV3Plus")
    if arch == "MaskRCNN":
        pm = cfg.get("parent_model", {})
        ona = cfg.get("eval_online_adapt", {})
        base_kwargs = {
            f.name: getattr(one_shot_cfg, f.name)
            for f in _dc.fields(one_shot_cfg)
        }
        det_cfg = DetectionOneShotConfig(
            **base_kwargs,
            proposal_aug_mode=pm.get(
                "eval_augment_rpn_proposals_mode", "EXTEND"
            ) or "NONE",
            ona_reset_mode=str(ona.get("reset_model_mode", "FIRST_STEP")),
            ona_only_box_head=bool(ona.get("only_box_head", False)),
        )
        return DetectionOneShotEvaluator(
            model, meta_cfg, det_cfg, mesh=mesh,
            fused_ona=bool(cfg.get("eval_fused_ona", True)),
        )
    return OneShotEvaluator(
        model.apply, meta_cfg, one_shot_cfg, mesh=mesh,
        fused_ona=bool(cfg.get("eval_fused_ona", True)),
    )


def main(argv=None):
    cfg = cfglib.parse_cli(argv if argv is not None else sys.argv[1:])
    save_dir = cfg.get("save_dir") or "models"
    logger = MetricsLogger(path=os.path.join(save_dir, "eval_metrics.jsonl"))

    model = build_parent_model(cfg)
    # params are resolution-independent (fully convolutional); init at the
    # configured eval size (data_cfg.init_hw) or the DAVIS 480p default
    init_hw = cfg.get("data_cfg", {}).get("init_hw") or (480, 864)
    params = init_model_params(cfg, model, input_hw=tuple(init_hw))
    meta_params = resolve_meta_params(cfg, model, params)

    evaluator = build_evaluator(cfg, model)

    indexes = build_indexes(cfg, "val")
    # leave-one-out parent selection: when parent_model.val.paths lists
    # multiple checkpoints, each sequence uses the parent whose val split
    # contains it (reference helper_func.py:483-496)
    selector = build_parent_state_selector(cfg, "val", params)
    preds_dir = cfg.get("save_preds")
    timer = Timer()

    all_j, all_f = [], []
    for index in indexes:
        for name, seq in index.sequences.items():
            if cfg.get("eval_init_j") and hasattr(
                evaluator, "eval_sequence_init"
            ):
                # pre-fine-tune baseline J (reference init_J,
                # evaluate.py:123-127)
                r0 = evaluator.eval_sequence_init(
                    index, name, meta_params,
                    init_params=selector.select(name) if selector else None,
                )
                logger.log("init_eval_seq", **r0)
            timer.start("seq")
            res = evaluator.eval_sequence(
                index, name, meta_params,
                jax.random.PRNGKey(int(cfg.get("seed", 1))),
                init_params=selector.select(name) if selector else None,
            )
            dt = timer.stop("seq")
            tpf = dt / max(len(seq), 1)
            logger.log(
                "eval_seq",
                seq=name,
                J_mean=res["J_mean"],
                F_mean=res["F_mean"],
                time_per_frame=tpf,
                fps=1.0 / tpf if tpf > 0 else float("inf"),
            )
            all_j.append(res["J_mean"])
            all_f.append(res["F_mean"])
            if preds_dir:
                out = os.path.join(preds_dir, name)
                os.makedirs(out, exist_ok=True)
                for t in range(res["merged"].shape[0]):
                    save_indexed_png(
                        os.path.join(out, f"{t:05d}.png"),
                        res["merged"][t].astype(np.uint8),
                    )
            if cfg.get("save_debug"):
                # mask+contour overlays (reference best_eval_preds_debug,
                # evaluate.py:384-425)
                from e_osvos_tpu.utils.visualize import save_debug_overlay

                dbg = os.path.join(str(cfg["save_debug"]), name)
                for t in range(res["merged"].shape[0]):
                    save_debug_overlay(
                        os.path.join(dbg, f"{t:05d}.png"),
                        index.get_image(name, t),
                        res["merged"][t],
                    )
    logger.log(
        "eval_total",
        J_mean=float(np.nanmean(all_j)) if all_j else float("nan"),
        F_mean=float(np.nanmean(all_f)) if all_f else float("nan"),
        num_sequences=len(all_j),
    )


if __name__ == "__main__":
    main()
