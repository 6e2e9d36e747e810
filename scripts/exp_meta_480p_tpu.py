"""Meta-training at reference shapes on TPU: held-out one-shot J uplift.

The strongest accuracy evidence this environment allows at FULL scale: run
the SPMD meta-training program (learned init + per-neuron lrs, 5-step BPTT,
psum over the task mesh — the reference's meta_batch_size/num_epochs/
bptt_epochs defaults, /root/reference/cfgs/meta.yaml:24-27) on the flagship
architecture (DeepLabV3Plus / resnet50 / frozen-BN / bf16) at 480x480
crops, then evaluate the e-OSVOS-10 protocol on HELD-OUT 480x854 sequences
and compare against the random init under the identical protocol
(/root/reference/src/train_meta.py:129-377 is the matched flow).

The small-model version of this experiment (tests/
test_meta_synth_benchmark.py) runs in-suite on the CPU mesh; this script is
the same design at reference scale on real hardware.

Calibration note (round 3): the round-2 outer lrs (model_init_lr=3e-3,
log_init_lr_lr=1e-3 — the small-model test values) diverge at resnet50/480p
scale: meta-loss rose 0.033→0.28 between iters 100→200 and one held-out
sequence collapsed to J=0 while the random init scored 0.81. The reference
trains with model_init_lr=log_init_lr_lr=1e-5 over thousands of iterations
(cfgs/meta.yaml:43-49); for a few-hundred-iteration run the defaults below
sit 10x above the reference and 30x below the diverged round-2 values, with
the reference's weight decay and elementwise grad clip.

Usage:  nohup python scripts/exp_meta_480p_tpu.py --iters 300 \
            > /tmp/meta480.log 2>&1 &
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
_ap.add_argument("--iters", type=int, default=300)
_ap.add_argument("--eval-every", type=int, default=100,
                 help="interleaved held-out eval interval (0 = end only)")
_ap.add_argument("--save", default="/tmp/meta480_ckpt_r3",
                 help="checkpoint directory")
_ap.add_argument("--resume", action="store_true",
                 help="resume from {save}/last_meta_iter.ckpt (restores "
                      "meta params + outer optimizer state + iteration "
                      "count; reuses the recorded random-init baselines "
                      "from the existing result JSON). For tunnel-drop "
                      "recovery — the training loop is host-driven, so a "
                      "dead axon RPC strands the client mid-iteration.")
_ap.add_argument("--out", default=None,
                 help="result json (default <repo>/BENCH_META_480P.json)")
_ap.add_argument("--model-init-lr", type=float, default=1e-4)
_ap.add_argument("--log-init-lr-lr", type=float, default=1e-4)
_ap.add_argument("--weight-decay", type=float, default=1e-4)
_ap.add_argument("--grad-clip", type=float, default=1.0)
_ap.add_argument("--train-seqs", type=int, default=32)
_ap.add_argument("--held-seqs", type=int, default=4)
ARGS = _ap.parse_args()

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_OUT = ARGS.out or os.path.join(_REPO, "BENCH_META_480P.json")


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

    # 480p training sequences; held-out sequences at the DAVIS eval geometry.
    # Half the training sequences carry the HARD augmentations (same-color
    # distractors / occluders / muted contrast) so the learned optimizer
    # trains on the discrimination problem the hard held-out set poses —
    # the in-framework analogue of the reference's copy-paste task
    # augmentation (meta_tasksets.py:109-150).
    train_idx = SyntheticVOSIndex(num_sequences=ARGS.train_seqs, num_frames=6,
                                  size=(480, 854), num_objects=1, seed=0)
    train_hard_idx = SyntheticVOSIndex(
        num_sequences=ARGS.train_seqs // 2, num_frames=6, size=(480, 854),
        num_objects=2, distractors=2, occluders=1, contrast=0.6, seed=1,
        name_prefix="trh",
    )
    held = SyntheticVOSIndex(num_sequences=ARGS.held_seqs, num_frames=10,
                             size=(480, 854), num_objects=1, seed=100,
                             name_prefix="held")
    # HARD held-out protocol (round-3 verdict item 8): same-color
    # distractors + occluders + 2 objects + muted contrast — built so a
    # random init cannot coast on color separability (the round-3 easy set
    # gave it J=0.832, leaving the meta uplift only 0.17 of headroom)
    held_hard = SyntheticVOSIndex(
        num_sequences=max(ARGS.held_seqs // 2, 2), num_frames=10,
        size=(480, 854), num_objects=2, distractors=2, occluders=1,
        contrast=0.6, seed=200, name_prefix="hard",
    )
    taskset = MetaTaskset(
        [train_idx, train_hard_idx],
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
        outer_cfg=OuterOptimConfig(
            model_init_lr=ARGS.model_init_lr,
            log_init_lr_lr=ARGS.log_init_lr_lr,
            lr=1e-3,
            model_init_weight_decay=ARGS.weight_decay,
            grad_clip=ARGS.grad_clip,
        ),
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

    result = {
        "experiment": "meta_480p_tpu",
        "config": {
            "iters": ARGS.iters, "meta_batch_size": trainer.train_cfg.meta_batch_size,
            "model_init_lr": ARGS.model_init_lr,
            "log_init_lr_lr": ARGS.log_init_lr_lr,
            "weight_decay": ARGS.weight_decay, "grad_clip": ARGS.grad_clip,
            "train_seqs": ARGS.train_seqs, "held_seqs": ARGS.held_seqs,
            "arch": "DeepLabV3Plus/resnet50/frozen_bn/os16/bf16",
            "crop": [480, 480], "eval_size": [480, 854],
            "protocol": "e-OSVOS-10 held-out",
        },
        "loss_curve": [],       # [iter, meta_loss] every iter
        "eval_curve": [],       # [iter, J_mean] interleaved held-out evals
        "ckpt": f"{ARGS.save}/last_meta_iter.ckpt",
        "status": "running",
    }

    def dump():
        with open(_OUT, "w") as f:
            json.dump(result, f)

    def eval_held(mp, tag, index=held):
        js = []
        for n in index.sequences:
            r = ev.eval_sequence(index, n, mp, jax.random.PRNGKey(5))
            js.append(r["J_mean"])
            print(f"  [{tag}] {n}: J={r['J_mean']:.4f} "
                  f"F={r['F_mean']:.4f}", flush=True)
        return float(np.mean(js))

    resumed_from = 0
    if ARGS.resume and os.path.exists(f"{ARGS.save}/last_meta_iter.ckpt"):
        trainer.restore(f"{ARGS.save}/last_meta_iter.ckpt")
        resumed_from = trainer.meta_iter
        if os.path.exists(_OUT):
            prev = json.load(open(_OUT))
            # keep the recorded baselines + the loss curve up to the
            # checkpointed iteration (later entries were never persisted
            # in model state)
            for k in ("j_random_init", "j_random_init_hard"):
                if k in prev:
                    result[k] = prev[k]
            result["loss_curve"] = [
                e for e in prev.get("loss_curve", []) if e[0] <= resumed_from
            ]
            result["eval_curve"] = [
                e for e in prev.get("eval_curve", []) if e[0] <= resumed_from
            ]
        result["resumed_from"] = resumed_from
        print(f"resumed at meta_iter={resumed_from}", flush=True)

    # random-init baseline FIRST, so the comparison target is on record even
    # if training is interrupted
    if "j_random_init" not in result:
        t_ev0 = time.time()
        j_rand = eval_held(init_meta_params(meta_cfg, params), "rand")
        result["j_random_init"] = j_rand
        print(f"random-init held-out J = {j_rand:.4f} "
              f"({time.time()-t_ev0:.0f}s incl. compile)", flush=True)
        j_rand_hard = eval_held(
            init_meta_params(meta_cfg, params), "rand-hard", held_hard
        )
        result["j_random_init_hard"] = j_rand_hard
        print(f"random-init HARD held-out J = {j_rand_hard:.4f}", flush=True)
    j_rand = result["j_random_init"]
    j_rand_hard = result["j_random_init_hard"]
    dump()

    t0 = time.time()
    done = resumed_from
    while done < ARGS.iters:
        out = trainer.run(1)
        done += 1
        result["loss_curve"].append([done, float(out["meta_loss"])])
        if done % 10 == 0:
            result["s_per_iter"] = (
                (time.time() - t0) / (done - resumed_from)
            )
            print(f"iter {done}: meta_loss={out['meta_loss']:.4f} "
                  f"({result['s_per_iter']:.2f} s/iter cum)", flush=True)
            dump()
        if ARGS.eval_every and done % ARGS.eval_every == 0:
            j = eval_held(trainer.meta_params, f"meta@{done}")
            result["eval_curve"].append([done, j])
            trainer.save(f"iter{done:05d}")
            dump()

    train_s = time.time() - t0
    j_meta = eval_held(trainer.meta_params, "meta")
    j_meta_hard = eval_held(trainer.meta_params, "meta-hard", held_hard)
    result.update({
        "status": "done",
        "train_s": train_s,
        "s_per_iter": train_s / max(done - resumed_from, 1),
        "j_meta": j_meta,
        "j_uplift": j_meta - j_rand,
        "j_meta_hard": j_meta_hard,
        "j_uplift_hard": j_meta_hard - j_rand_hard,
    })
    dump()
    print(f"held-out J (e-OSVOS-10 protocol, 480x854): "
          f"meta-trained={j_meta:.4f}  random-init={j_rand:.4f} "
          f"(uplift {j_meta - j_rand:+.4f}); "
          f"{train_s/max(done - resumed_from,1):.2f} s/iter over "
          f"{done - resumed_from} iters (resumed from {resumed_from})",
          flush=True)


if __name__ == "__main__":
    main()
