"""One SPMD meta-training iteration at reference shapes on one chip.

4 tasks x 5-step BPTT inner loop at 480x480 crops (meta_batch_size /
num_epochs / bptt_epochs defaults of cfgs/meta.yaml), remat on, fused outer
RAdam — the steady-state cost of MetaTrainer.run's jitted step.

Run: nohup python scripts/bench_meta_step.py > /tmp/bench_meta.log 2>&1 &
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from e_osvos_tpu.data.synthetic import SyntheticVOSIndex
    from e_osvos_tpu.data.transforms import AugmentConfig
    from e_osvos_tpu.engine.meta_trainer import MetaTrainConfig, MetaTrainer
    from e_osvos_tpu.meta_optim import MetaOptimConfig
    from e_osvos_tpu.meta_optim.tasksets import MetaTaskset, MetaTasksetConfig
    from e_osvos_tpu.models import DeepLabV3Plus
    from e_osvos_tpu.parallel import MetaStepConfig, OuterOptimConfig, make_mesh
    from e_osvos_tpu.utils import MetricsLogger

    print(f"devices: {jax.devices()}", flush=True)
    n_dev = len(jax.devices())
    mesh = make_mesh(num_tasks=n_dev)

    model = DeepLabV3Plus(
        num_classes=1, arch="resnet50", backbone_norm="frozen_bn",
        output_stride=16, dtype=jnp.bfloat16,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 480, 480, 3), jnp.float32)
    )

    index = SyntheticVOSIndex(num_sequences=4, num_frames=8, size=(480, 480))
    taskset = MetaTaskset(
        [index], MetaTasksetConfig(num_query_frames=1, crop_size=(480, 480)),
        seed=0,
    )

    def measure(step_cfg, tag):
        trainer = MetaTrainer(
            model_apply=model.apply,
            init_params=params,
            taskset=taskset,
            meta_cfg=MetaOptimConfig(lr_hierarchy_level="neuron",
                                     init_lr=1e-3, learn_model_init=True,
                                     use_log_init_lr=False),
            step_cfg=step_cfg,
            outer_cfg=OuterOptimConfig(),
            train_cfg=MetaTrainConfig(meta_batch_size=4, num_meta_iters=1,
                                      vis_interval=10_000),
            mesh=mesh,
            logger=MetricsLogger(echo=False),
        )
        out = trainer.run(1)  # compile + first step
        print(f"[{tag}] first step done, meta_loss:",
              float(out["meta_loss"]), flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = trainer.run(1)
            _ = float(out["meta_loss"])  # device→host barrier
            best = min(best, time.perf_counter() - t0)
        print(f"[{tag}] meta step: {best:.3f} s (4 tasks x 5-step BPTT, "
              f"480^2, {n_dev} device(s))", flush=True)

    # this framework's rich mode: 3 independent support augmentations per
    # inner step, un-augmented queries
    measure(MetaStepConfig(num_epochs=5, bptt_epochs=5, train_batch_size=3,
                           augment=AugmentConfig()),
            "per-step batch3")
    # reference-parity mode (random_frame_transform_per_task=True +
    # batch_sizes.train=1, the upstream meta defaults): support augmented
    # once per task, queries augmented with shared flip/color
    measure(MetaStepConfig(num_epochs=5, bptt_epochs=5, train_batch_size=1,
                           augment=AugmentConfig(),
                           frame_transform_per_task=True),
            "per-task batch1")


if __name__ == "__main__":
    main()
