"""Parent-seeded detection meta-training at 480p on TPU.

Round-3 verdict item 1: the Mask R-CNN disk-protocol J (0.634) sits ~0.3
below the dense path on the same tree. The round-3 detection disk run
fine-tuned with CONSTANT-lr SGD from a 600-iter parent — but the
reference's published J table is produced by a meta-TRAINED optimizer on a
COCO-seeded model (its eval always loads a meta state,
/root/reference/src/util/evaluate.py:119-121; the parent comes from
helper_func.py:339-346). At small scale, meta-learned lrs moved detection
J 0.495 → 0.731 (BENCH_DET_META.json). This script supplies the missing
480p pieces over the SAME disk tree:

  1. a stronger supervised detection parent (--parent-iters, via the
     train_parent CLI — the COCO-seed analogue);
  2. parent-seeded meta-training of the detection optimizer (learned init
     + per-neuron lrs, 5-step BPTT at 480x480 crops,
     parallel/meta_step.py::detection_task_fns) on the tree's train split;
  3. checkpoints the disk-eval CLI loads via meta_optim_model_file
     (scripts/tpu_e2e_disk_480p.py --meta-ckpt).

Usage:
  nohup python scripts/exp_det_meta_480p.py --parent-iters 2000 \
      --meta-iters 150 > /tmp/detmeta480.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

_ap = argparse.ArgumentParser()
_ap.add_argument("--work", default="/tmp/det480",
                 help="work dir (tree + checkpoints persist across phases)")
_ap.add_argument("--parent-iters", type=int, default=2000)
_ap.add_argument("--parent-ckpt", default=None,
                 help="reuse an existing parent checkpoint")
_ap.add_argument("--meta-iters", type=int, default=150)
_ap.add_argument("--meta-batch", type=int, default=4)
_ap.add_argument("--train-batch", type=int, default=3,
                 help="inner fine-tune batch (reference batch_sizes.train)")
_ap.add_argument("--num-epochs", type=int, default=5)
_ap.add_argument("--model-init-lr", type=float, default=1e-4,
                 help="outer lr (the dense 480p calibration, "
                      "scripts/exp_meta_480p_tpu.py round-3 note)")
_ap.add_argument("--log-init-lr-lr", type=float, default=1e-4)
_ap.add_argument("--weight-decay", type=float, default=1e-4)
_ap.add_argument("--grad-clip", type=float, default=1.0)
_ap.add_argument("--out", default=None,
                 help="result json (default <repo>/BENCH_DET_META480.json)")
ARGS = _ap.parse_args()

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_OUT = ARGS.out or os.path.join(_REPO, "BENCH_DET_META480.json")


def main():
    from e_osvos_tpu.cli.common import build_parent_model
    from e_osvos_tpu.data.datasets import DAVISIndex
    from e_osvos_tpu.data.synthetic_disk import build_480p_tree
    from e_osvos_tpu.data.transforms import AugmentConfig
    from e_osvos_tpu.engine.meta_trainer import MetaTrainConfig, MetaTrainer
    from e_osvos_tpu.meta_optim import MetaOptimConfig
    from e_osvos_tpu.meta_optim.tasksets import MetaTaskset, MetaTasksetConfig
    from e_osvos_tpu.parallel import (
        MetaStepConfig,
        OuterOptimConfig,
        make_mesh,
    )
    from e_osvos_tpu.parallel.meta_step import detection_task_fns
    from e_osvos_tpu.utils import MetricsLogger, load_checkpoint

    os.makedirs(ARGS.work, exist_ok=True)
    tree = os.path.join(ARGS.work, "DAVIS")
    if not os.path.isdir(tree):
        build_480p_tree(tree, with_train=True)
        print(f"tree built at {tree}", flush=True)
    else:
        print(f"reusing tree at {tree}", flush=True)

    # the EXACT model configuration the disk-eval CLI builds (cli/common.py
    # build_parent_model MaskRCNN defaults) so checkpoint trees interchange
    model_cfg = {
        "parent_model": {
            "architecture": "MaskRCNN",
            "encoder": "resnet50",
            "backbone_norm": "group",
            "detections_per_img": 1,
            "dtype": "bfloat16",
        }
    }
    model = build_parent_model(model_cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(2)},
        jnp.zeros((1, 480, 480, 3), jnp.float32),
    )

    # -- phase 1: supervised detection parent (the COCO-seed analogue) -----
    parent_ckpt = ARGS.parent_ckpt
    if not parent_ckpt:
        parent_ckpt = os.path.join(
            ARGS.work, f"parent{ARGS.parent_iters}", "parent_final.ckpt"
        )
    if not os.path.exists(parent_ckpt):
        from e_osvos_tpu.cli import train_parent as tp_cli

        pdir = os.path.dirname(parent_ckpt)
        t0 = time.time()
        tp_cli.main([
            "with",
            "datasets.train.name=DAVIS-2017",
            "datasets.train.split=train",
            f"datasets.train.root={tree}",
            "parent_model.architecture=MaskRCNN",
            "parent_model.encoder=resnet50",
            "parent_model.backbone_norm=group",
            "parent_model.dtype=bfloat16",
            f"parent.num_iters={ARGS.parent_iters}",
            "parent.batch_size=4",
            "parent.lr=1e-4",
            "parent.max_objects=2",
            "parent.snapshot_interval=100000",
            "data_cfg.crop_sizes.train=[480,480]",
            f"save_dir={pdir}",
        ])
        print(f"parent trained in {time.time()-t0:.0f}s: {parent_ckpt}",
              flush=True)
    else:
        print(f"reusing parent: {parent_ckpt}", flush=True)
    params, _ = load_checkpoint(parent_ckpt, params)

    # -- phase 2: parent-seeded meta-training -------------------------------
    meta_cfg = MetaOptimConfig(lr_hierarchy_level="neuron", init_lr=1e-3,
                               learn_model_init=True, use_log_init_lr=False)
    train_idx = DAVISIndex(root=tree, split="train", year="2017")
    taskset = MetaTaskset(
        [train_idx],
        MetaTasksetConfig(num_query_frames=1, crop_size=(480, 480)),
        seed=0,
    )
    step_cfg = MetaStepConfig(
        num_epochs=ARGS.num_epochs, bptt_epochs=ARGS.num_epochs,
        train_batch_size=ARGS.train_batch, remat=True,
        augment=AugmentConfig(),
    )
    save_dir = os.path.join(ARGS.work, "meta")
    trainer = MetaTrainer(
        model_apply=model.apply,
        init_params=params,
        taskset=taskset,
        meta_cfg=meta_cfg,
        step_cfg=step_cfg,
        outer_cfg=OuterOptimConfig(
            model_init_lr=ARGS.model_init_lr,
            log_init_lr_lr=ARGS.log_init_lr_lr,
            lr=1e-3,
            model_init_weight_decay=ARGS.weight_decay,
            grad_clip=ARGS.grad_clip,
        ),
        train_cfg=MetaTrainConfig(
            meta_batch_size=ARGS.meta_batch,
            num_meta_iters=ARGS.meta_iters,
            vis_interval=10,
            save_dir=save_dir,
        ),
        mesh=make_mesh(num_tasks=len(jax.devices())),
        logger=MetricsLogger(echo=True),
        task_fns=detection_task_fns(model, step_cfg),
    )

    result = {
        "experiment": "det_meta_480p_tpu",
        "config": {
            "parent_iters": ARGS.parent_iters,
            "meta_iters": ARGS.meta_iters,
            "meta_batch": ARGS.meta_batch,
            "train_batch": ARGS.train_batch,
            "num_epochs": ARGS.num_epochs,
            "model_init_lr": ARGS.model_init_lr,
            "log_init_lr_lr": ARGS.log_init_lr_lr,
            "arch": "MaskRCNN/resnet50/group/dpi1/bf16",
            "crop": [480, 480],
        },
        "parent_ckpt": parent_ckpt,
        "meta_ckpt": os.path.join(save_dir, "last_meta_iter.ckpt"),
        "loss_curve": [],
        "status": "running",
    }

    def dump():
        with open(_OUT, "w") as f:
            json.dump(result, f)

    dump()
    t0 = time.time()
    done = 0
    while done < ARGS.meta_iters:
        out = trainer.run(1)
        done += 1
        result["loss_curve"].append([done, float(out["meta_loss"])])
        if done % 10 == 0 or done == 1:
            result["s_per_iter"] = (time.time() - t0) / done
            print(f"iter {done}: meta_loss={out['meta_loss']:.4f} "
                  f"({result['s_per_iter']:.2f} s/iter cum)", flush=True)
            dump()
    trainer.save("last_meta_iter")
    result["status"] = "done"
    result["train_s"] = time.time() - t0
    dump()
    print(f"meta checkpoint: {result['meta_ckpt']}", flush=True)


if __name__ == "__main__":
    main()
