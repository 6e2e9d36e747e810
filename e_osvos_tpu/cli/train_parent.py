"""Parent pre-training CLI (rebuild of /root/reference/src/train_parent.py).

Usage:
  python -m e_osvos_tpu.cli.train_parent with DAVIS-2017 parent.num_iters=5000
"""

from __future__ import annotations

import os
import sys

from e_osvos_tpu import config as cfglib
from e_osvos_tpu.cli.common import (
    build_indexes,
    build_parent_model,
    init_model_params,
)
from e_osvos_tpu.data import transforms
from e_osvos_tpu.engine.parent_trainer import (
    FrameSampler,
    InstanceFrameSampler,
    ParentTrainConfig,
    ParentTrainer,
)
from e_osvos_tpu.utils import MetricsLogger, save_checkpoint


def to_parent_config(cfg) -> ParentTrainConfig:
    p = cfg.get("parent", {})
    crop = cfg.get("data_cfg", {}).get("crop_sizes", {}).get("train") or (480, 480)
    if isinstance(crop, int):
        crop = (crop, crop)
    arch = cfg.get("parent_model", {}).get("architecture", "DeepLabV3Plus")
    return ParentTrainConfig(
        task="detection" if arch == "MaskRCNN" else "dense",
        max_objects=int(p.get("max_objects", 3)),
        num_iters=int(p.get("num_iters", 10000)),
        batch_size=int(p.get("batch_size", 8)),
        lr=float(p.get("lr", 1e-4)),
        weight_decay=float(p.get("weight_decay", 0.0)),
        optimizer=str(p.get("optimizer", "adam")),
        loss_func=str(p.get("loss_func", cfg.get("loss_func", "cross_entropy_and_dice"))),
        crop_size=tuple(crop),
        normalize_mode=(
            "unit" if cfg.get("data_cfg", {}).get("normalize") else "davis"
        ),
        log_interval=int(p.get("log_interval", 50)),
        snapshot_interval=int(p.get("snapshot_interval", 1000)),
        save_dir=cfg.get("save_dir"),
        seed=int(cfg.get("seed", 0)),
        augment=cfglib.to_augment_config(cfg),
    )


def main(argv=None):
    cfg = cfglib.parse_cli(argv if argv is not None else sys.argv[1:])
    save_dir = cfg.get("save_dir") or "models"
    cfg["save_dir"] = save_dir

    model = build_parent_model(cfg)
    pcfg = to_parent_config(cfg)
    params = init_model_params(cfg, model, input_hw=pcfg.crop_size)
    indexes = build_indexes(cfg, "train")
    if pcfg.task == "detection":
        sampler = InstanceFrameSampler(
            indexes, pcfg.crop_size, max_objects=pcfg.max_objects,
            seed=pcfg.seed,
        )
    else:
        sampler = FrameSampler(indexes, pcfg.crop_size, seed=pcfg.seed)

    trainer = ParentTrainer(
        model_apply=model.apply,
        params=params,
        sampler=sampler,
        cfg=pcfg,
        logger=MetricsLogger(path=os.path.join(save_dir, "parent_metrics.jsonl")),
    )
    trainer.run()
    save_checkpoint(
        os.path.join(save_dir, "parent_final.ckpt"),
        trainer.params,
        metadata={"step": trainer.step_num},
    )


if __name__ == "__main__":
    main()
