"""Meta-training at reference shapes on TPU: held-out one-shot J uplift.

The strongest accuracy evidence this environment allows at FULL scale: run
the SPMD meta-training program (learned init + per-neuron lrs, 5-step BPTT,
psum over the task mesh — the reference's meta_batch_size/num_epochs/
bptt_epochs defaults, cfgs/meta.yaml) on the flagship architecture
(DeepLabV3Plus / resnet50 / frozen-BN / os16 / bf16) at 480x480 crops, then
evaluate the e-OSVOS-10 protocol on HELD-OUT 480x854 sequences and compare
against the random init under the identical protocol.

The small-model version of this experiment (tests/
test_meta_synth_benchmark.py) runs in-suite on the CPU mesh; this script is
the same design at reference scale on real hardware.

Usage:  nohup python scripts/exp_meta_480p_tpu.py --iters 300 \
            > /tmp/meta480.log 2>&1 &
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

_ap = argparse.ArgumentParser()
_ap.add_argument("--iters", type=int, default=300)
_ap.add_argument("--eval-every", type=int, default=0,
                 help="interleaved held-out eval interval (0 = end only)")
_ap.add_argument("--save", default="/tmp/meta480_ckpt",
                 help="checkpoint directory")
ARGS = _ap.parse_args()


def main():
    from e_osvos_tpu.data.synthetic import SyntheticVOSIndex
    from e_osvos_tpu.data.transforms import AugmentConfig
    from e_osvos_tpu.engine import OneShotConfig, OneShotEvaluator
    from e_osvos_tpu.engine.meta_trainer import MetaTrainConfig, MetaTrainer
    from e_osvos_tpu.meta_optim import MetaOptimConfig, init_meta_params
    from e_osvos_tpu.meta_optim.tasksets import MetaTaskset, MetaTasksetConfig
    from e_osvos_tpu.models import DeepLabV3Plus
    from e_osvos_tpu.parallel import (
        MetaStepConfig,
        OuterOptimConfig,
        make_mesh,
    )
    from e_osvos_tpu.utils import MetricsLogger

    print(f"devices: {jax.devices()}", flush=True)
    mesh = make_mesh(num_tasks=len(jax.devices()))

    model = DeepLabV3Plus(
        num_classes=1, arch="resnet50", backbone_norm="frozen_bn",
        output_stride=16, dtype=jnp.bfloat16,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 480, 480, 3), jnp.float32)
    )
    meta_cfg = MetaOptimConfig(lr_hierarchy_level="neuron", init_lr=1e-3,
                               learn_model_init=True, use_log_init_lr=False)

    # 480p training sequences; held-out sequences at the DAVIS eval geometry
    train_idx = SyntheticVOSIndex(num_sequences=8, num_frames=8,
                                  size=(480, 854), num_objects=1, seed=0)
    held = SyntheticVOSIndex(num_sequences=2, num_frames=10, size=(480, 854),
                             num_objects=1, seed=100, name_prefix="held")
    taskset = MetaTaskset(
        [train_idx],
        MetaTasksetConfig(num_query_frames=1, crop_size=(480, 480)),
        seed=0,
    )
    trainer = MetaTrainer(
        model_apply=model.apply,
        init_params=params,
        taskset=taskset,
        meta_cfg=meta_cfg,
        step_cfg=MetaStepConfig(num_epochs=5, bptt_epochs=5,
                                train_batch_size=3,
                                loss_func="cross_entropy_and_dice",
                                augment=AugmentConfig()),
        outer_cfg=OuterOptimConfig(model_init_lr=3e-3, log_init_lr_lr=1e-3,
                                   lr=1e-3, model_init_weight_decay=0.0,
                                   grad_clip=1.0),
        train_cfg=MetaTrainConfig(meta_batch_size=len(jax.devices()) * 4,
                                  num_meta_iters=ARGS.iters,
                                  vis_interval=10, save_dir=ARGS.save),
        mesh=mesh,
        logger=MetricsLogger(echo=True),
    )

    os_cfg = OneShotConfig(num_epochs=10, batch_size=3,
                           loss_func="cross_entropy_and_dice",
                           augment=AugmentConfig())
    ev = OneShotEvaluator(model.apply, meta_cfg, os_cfg)

    def eval_held(mp, tag):
        js = []
        for n in held.sequences:
            r = ev.eval_sequence(held, n, mp, jax.random.PRNGKey(5))
            js.append(r["J_mean"])
            print(f"  [{tag}] {n}: J={r['J_mean']:.4f} "
                  f"F={r['F_mean']:.4f}", flush=True)
        return float(np.mean(js))

    t0 = time.time()
    if ARGS.eval_every:
        done = 0
        while done < ARGS.iters:
            n = min(ARGS.eval_every, ARGS.iters - done)
            out = trainer.run(n)
            done += n
            print(f"iter {done}: meta_loss={out['meta_loss']:.4f} "
                  f"({(time.time()-t0)/done:.2f} s/iter)", flush=True)
            eval_held(trainer.meta_params, f"meta@{done}")
    else:
        out = trainer.run()
        print(f"meta-train {ARGS.iters} iters in {time.time()-t0:.0f}s, "
              f"final meta_loss={out['meta_loss']:.4f}", flush=True)

    j_meta = eval_held(trainer.meta_params, "meta")
    j_rand = eval_held(init_meta_params(meta_cfg, params), "rand")
    print(f"held-out J (e-OSVOS-10 protocol, 480x854): "
          f"meta-trained={j_meta:.4f}  random-init={j_rand:.4f}", flush=True)


if __name__ == "__main__":
    main()
