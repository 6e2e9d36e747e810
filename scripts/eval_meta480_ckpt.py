"""Held-out eval for the 480p meta-training experiment, standalone.

Evaluates either the random init or a checkpoint saved by
scripts/exp_meta_480p_tpu.py under the identical e-OSVOS-10 protocol on the
same held-out synthetic 480x854 sequences, so the meta-trained-vs-random
comparison can be produced even if the training process is still running or
was stopped early.  Shares the bench compile cache, so after the training
script's first eval this compiles from cache.

Usage:  python scripts/eval_meta480_ckpt.py [--ckpt /tmp/meta480_ckpt/last.ckpt]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

_ap = argparse.ArgumentParser()
_ap.add_argument("--ckpt", default=None,
                 help="checkpoint file; default = random init")
ARGS = _ap.parse_args()


def main():
    from e_osvos_tpu.data.synthetic import SyntheticVOSIndex
    from e_osvos_tpu.data.transforms import AugmentConfig
    from e_osvos_tpu.engine import OneShotConfig, OneShotEvaluator
    from e_osvos_tpu.meta_optim import MetaOptimConfig, init_meta_params
    from e_osvos_tpu.models import DeepLabV3Plus
    from flax import serialization

    model = DeepLabV3Plus(
        num_classes=1, arch="resnet50", backbone_norm="frozen_bn",
        output_stride=16, dtype=jnp.bfloat16,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 480, 480, 3), jnp.float32)
    )
    meta_cfg = MetaOptimConfig(lr_hierarchy_level="neuron", init_lr=1e-3,
                               learn_model_init=True, use_log_init_lr=False)
    meta_params = init_meta_params(meta_cfg, params)
    tag = "rand"
    if ARGS.ckpt:
        with open(ARGS.ckpt, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        meta_params = serialization.from_state_dict(
            meta_params, raw["meta_params"]
        )
        tag = os.path.basename(ARGS.ckpt)

    held = SyntheticVOSIndex(num_sequences=2, num_frames=10, size=(480, 854),
                             num_objects=1, seed=100, name_prefix="held")
    os_cfg = OneShotConfig(num_epochs=10, batch_size=3,
                           loss_func="cross_entropy_and_dice",
                           augment=AugmentConfig())
    ev = OneShotEvaluator(model.apply, meta_cfg, os_cfg)
    js = []
    for n in held.sequences:
        r = ev.eval_sequence(held, n, meta_params, jax.random.PRNGKey(5))
        js.append(r["J_mean"])
        print(f"  [{tag}] {n}: J={r['J_mean']:.4f} F={r['F_mean']:.4f}",
              flush=True)
    print(f"[{tag}] held-out J mean = {float(np.mean(js)):.4f}", flush=True)


if __name__ == "__main__":
    main()
