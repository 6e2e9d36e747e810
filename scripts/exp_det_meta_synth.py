"""Calibration run for the detection meta-trained synthetic benchmark
(tests/test_meta_synth_benchmark.py detection variant): meta-train a tiny
Mask R-CNN on synthetic sequences, then measure held-out one-shot J from
the meta-trained params vs the random init under the identical protocol.

CPU-mesh experiment; prints the numbers the test bar is derived from.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

_ap = argparse.ArgumentParser()
_ap.add_argument("--tpu", action="store_true",
                 help="run on the default (TPU) backend instead of the "
                 "8-device CPU mesh")
_ap.add_argument("--size", type=int, default=64, help="frame side length")
_ap.add_argument("--iters", type=int, default=60)
_ap.add_argument("--arch", default="resnet10")
_ap.add_argument("--num-train-seqs", type=int, default=6)
_ap.add_argument("--parent-iters", type=int, default=0,
                 help="supervised detection parent-training iterations "
                 "before meta-training (the in-environment analog of the "
                 "reference's COCO seed, helper_func.py:339-346); 0 = "
                 "from-scratch (the round-2 calibration)")
ARGS = _ap.parse_args()

if not ARGS.tpu:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from e_osvos_tpu.data.synthetic import SyntheticVOSIndex  # noqa: E402
from e_osvos_tpu.data.transforms import AugmentConfig  # noqa: E402
from e_osvos_tpu.engine.meta_trainer import MetaTrainConfig, MetaTrainer  # noqa: E402
from e_osvos_tpu.engine.one_shot_detection import (  # noqa: E402
    DetectionOneShotConfig,
    DetectionOneShotEvaluator,
)
from e_osvos_tpu.meta_optim import MetaOptimConfig, init_meta_params  # noqa: E402
from e_osvos_tpu.meta_optim.tasksets import MetaTaskset, MetaTasksetConfig  # noqa: E402
from e_osvos_tpu.models import MaskRCNN, RoIConfig, RPNConfig  # noqa: E402
from e_osvos_tpu.parallel import (  # noqa: E402
    MetaStepConfig,
    OuterOptimConfig,
    make_mesh,
)
from e_osvos_tpu.parallel.meta_step import detection_task_fns  # noqa: E402
from e_osvos_tpu.utils import MetricsLogger  # noqa: E402

SIZE = (ARGS.size, ARGS.size)
MILD = AugmentConfig(scale_min=0.95, scale_max=1.05, rot_deg=5.0,
                     brightness=0.02, contrast=0.02, saturation=0.02,
                     flip_prob=0.0)


def tiny_model():
    return MaskRCNN(
        arch=ARGS.arch, backbone_norm="group4",
        rpn=RPNConfig(anchor_sizes=(8, 16, 32, 64, 128),
                      pre_nms_top_n=32, post_nms_top_n=16,
                      batch_size_per_image=16),
        roi=RoIConfig(batch_size_per_image=8, detections_per_img=1),
    )


def main():
    model = tiny_model()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1,) + SIZE + (3,), jnp.float32),
    )
    meta_cfg = MetaOptimConfig(lr_hierarchy_level="neuron", init_lr=1e-3,
                               learn_model_init=True, use_log_init_lr=False)

    train_idx = SyntheticVOSIndex(num_sequences=ARGS.num_train_seqs,
                                  num_frames=4, size=SIZE,
                                  num_objects=1, seed=0)
    held = SyntheticVOSIndex(num_sequences=2, num_frames=4, size=SIZE,
                             num_objects=1, seed=100, name_prefix="held")

    if ARGS.parent_iters > 0:
        from e_osvos_tpu.engine.parent_trainer import (
            InstanceFrameSampler,
            ParentTrainConfig,
            ParentTrainer,
        )

        n_sh = min(4, jax.device_count())
        pt = ParentTrainer(
            model_apply=model.apply,
            params=variables,
            sampler=InstanceFrameSampler([train_idx], SIZE, max_objects=1,
                                         seed=0),
            cfg=ParentTrainConfig(
                task="detection", max_objects=1, batch_size=4 * n_sh,
                lr=1e-3, crop_size=SIZE, log_interval=10,
                snapshot_interval=10**9, augment=MILD,
            ),
            mesh=make_mesh(num_tasks=n_sh, devices=jax.devices()[:n_sh]),
            logger=MetricsLogger(echo=True),
        )
        t0 = time.time()
        last = pt.run(ARGS.parent_iters)
        print(f"parent-train done in {time.time()-t0:.1f}s, "
              f"loss={last['loss']:.4f}", flush=True)
        variables = pt.params
    taskset = MetaTaskset(
        [train_idx], MetaTasksetConfig(num_query_frames=1, crop_size=SIZE),
        seed=0,
    )
    n_shards = min(4, jax.device_count())
    mesh = make_mesh(num_tasks=n_shards, devices=jax.devices()[:n_shards])
    step_cfg = MetaStepConfig(num_epochs=3, bptt_epochs=3,
                              train_batch_size=1, remat=False, augment=MILD)
    trainer = MetaTrainer(
        model_apply=model.apply,
        init_params=variables,
        taskset=taskset,
        meta_cfg=meta_cfg,
        step_cfg=step_cfg,
        outer_cfg=OuterOptimConfig(model_init_lr=1e-3, log_init_lr_lr=1e-3,
                                   lr=1e-3, model_init_weight_decay=0.0,
                                   grad_clip=0.1),
        train_cfg=MetaTrainConfig(meta_batch_size=4, num_meta_iters=ARGS.iters,
                                  vis_interval=10),
        mesh=mesh,
        logger=MetricsLogger(echo=True),
        task_fns=detection_task_fns(model, step_cfg),
    )
    t0 = time.time()
    out = trainer.run()
    print(f"meta-train done in {time.time()-t0:.1f}s, "
          f"final meta_loss={out['meta_loss']:.4f}", flush=True)

    os_cfg = DetectionOneShotConfig(num_epochs=10, batch_size=1, augment=MILD)
    ev = DetectionOneShotEvaluator(model, meta_cfg, os_cfg)

    def eval_all(mp, tag):
        js = []
        for n in held.sequences:
            r = ev.eval_sequence(held, n, mp, jax.random.PRNGKey(5))
            js.append(r["J_mean"])
            print(f"  {tag} {n}: J={r['J_mean']:.4f}", flush=True)
        return js

    t0 = time.time()
    js = eval_all(trainer.meta_params, "meta")
    js0 = eval_all(init_meta_params(meta_cfg, variables), "seed-init")
    print(f"eval done in {time.time()-t0:.1f}s", flush=True)
    print(f"meta-trained J: {np.mean(js):.4f}  "
          f"pre-meta (parent or random) init J: {np.mean(js0):.4f}",
          flush=True)


if __name__ == "__main__":
    main()
