"""Meta-training CLI (the rebuild of /root/reference/src/train_meta.py).

Usage:
  python -m e_osvos_tpu.cli.train_meta with YouTube-VOS num_meta_iters=1000
"""

from __future__ import annotations

import os
import sys

import jax

from e_osvos_tpu import config as cfglib
from e_osvos_tpu.cli.common import (
    build_indexes,
    build_parent_model,
    init_model_params,
    resolve_meta_params,
)
from e_osvos_tpu.engine.meta_trainer import MetaTrainer
from e_osvos_tpu.meta_optim.tasksets import MetaTaskset
from e_osvos_tpu.parallel import make_mesh
from e_osvos_tpu.utils import MetricsLogger


def main(argv=None):
    cfg = cfglib.parse_cli(argv if argv is not None else sys.argv[1:])
    save_dir = cfg.get("save_dir") or "models"
    if cfg.get("env_suffix"):
        save_dir = os.path.join(save_dir, str(cfg["env_suffix"]))
    cfg["save_dir"] = save_dir

    model = build_parent_model(cfg)
    crop = cfglib.to_taskset_config(cfg).crop_size
    params = init_model_params(cfg, model, input_hw=crop)

    indexes = build_indexes(cfg, "train")
    taskset = MetaTaskset(
        indexes, cfglib.to_taskset_config(cfg), seed=int(cfg.get("seed", 1))
    )

    # architecture dispatch (reference default is MaskRCNN, cfgs/meta.yaml:70):
    # the detection family meta-trains through the same SPMD step with its
    # own support/query loss pair
    arch = cfg.get("parent_model", {}).get("architecture", "DeepLabV3Plus")
    task_fns = None
    if arch == "MaskRCNN":
        from e_osvos_tpu.parallel.meta_step import detection_task_fns

        task_fns = detection_task_fns(model, cfglib.to_meta_step_config(cfg))

    eval_fn = None
    val_indexes = build_indexes(cfg, "val")
    if val_indexes and cfg.get("eval_interval"):
        from e_osvos_tpu.cli.evaluate import build_evaluator

        evaluator = build_evaluator(cfg, model)
        index = val_indexes[0]

        init_j_done = []  # init_J logs once, at the first interleaved eval

        def eval_fn(meta_params, meta_iter):
            import numpy as np

            out = {}
            if not init_j_done and hasattr(evaluator, "eval_sequence_init"):
                # pre-fine-tune baseline, once per run (the reference logs
                # init_J from its eval workers, evaluate.py:123-127)
                init_js = [
                    evaluator.eval_sequence_init(index, name, meta_params)[
                        "init_J_mean"
                    ]
                    for name in index.sequences
                ]
                out["init_J_mean"] = float(np.nanmean(init_js))
                init_j_done.append(True)
            results = [
                evaluator.eval_sequence(
                    index, name, meta_params, jax.random.PRNGKey(meta_iter)
                )
                for name in index.sequences
            ]
            js = [r["J_mean"] for r in results]
            fs = [r["F_mean"] for r in results]
            out.update({
                "J_mean": float(np.nanmean(js)),
                "F_mean": float(np.nanmean(fs)),
                "per_seq_J": {r["seq"]: r["J_mean"] for r in results},
            })
            return out

    trainer = MetaTrainer(
        model_apply=model.apply,
        init_params=params,
        taskset=taskset,
        meta_cfg=cfglib.to_meta_optim_config(cfg),
        step_cfg=cfglib.to_meta_step_config(cfg),
        outer_cfg=cfglib.to_outer_optim_config(cfg),
        train_cfg=cfglib.to_meta_train_config(cfg),
        mesh=make_mesh(),
        logger=MetricsLogger(path=os.path.join(save_dir, "metrics.jsonl")),
        eval_fn=eval_fn,
        task_fns=task_fns,
    )
    trainer.meta_params = resolve_meta_params(cfg, model, params)
    if cfg.get("resume"):
        trainer.restore(cfg["resume"])
    trainer.run()
    trainer.save("last_meta_iter")


if __name__ == "__main__":
    main()
