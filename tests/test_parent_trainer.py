"""Parent pre-training engine tests (SPMD supervised trainer)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e_osvos_tpu.data.synthetic import SyntheticVOSIndex
from e_osvos_tpu.data.transforms import AugmentConfig
from e_osvos_tpu.engine.parent_trainer import (
    FrameSampler,
    ParentTrainConfig,
    ParentTrainer,
)
from e_osvos_tpu.models import DeepLabV3
from e_osvos_tpu.parallel import make_mesh
from e_osvos_tpu.utils import MetricsLogger

SIZE = (32, 32)
MILD = AugmentConfig(scale_min=0.95, scale_max=1.05, rot_deg=5.0,
                     brightness=0.02, contrast=0.02, saturation=0.02,
                     flip_prob=0.0)


class TestFrameSampler:
    def test_shapes_and_labels(self):
        index = SyntheticVOSIndex(num_sequences=2, num_frames=3, size=SIZE)
        sampler = FrameSampler([index], SIZE, seed=0)
        imgs, labels, seeds = sampler.sample_batch(4)
        assert imgs.shape == (4,) + SIZE + (3,)
        assert labels.shape == (4,) + SIZE
        assert set(np.unique(labels)) <= {0, 1, 255}
        assert seeds.shape == (4,)


@pytest.mark.slow
class TestParentTrainer:
    def test_loss_decreases(self, tmp_path):
        index = SyntheticVOSIndex(num_sequences=2, num_frames=4, size=SIZE,
                                  seed=3)
        sampler = FrameSampler([index], SIZE, seed=0)
        model = DeepLabV3(num_classes=1, arch="resnet10",
                          backbone_norm="group4", head_norm="group4")
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1,) + SIZE + (3,)))
        trainer = ParentTrainer(
            model_apply=model.apply,
            params=params,
            sampler=sampler,
            cfg=ParentTrainConfig(
                num_iters=12, batch_size=8, lr=3e-3, crop_size=SIZE,
                log_interval=4, snapshot_interval=8,
                save_dir=str(tmp_path), augment=MILD,
            ),
            mesh=make_mesh(num_tasks=4),
            logger=MetricsLogger(echo=False),
        )
        first = trainer.run(1)["loss"]
        last = trainer.run(11)["loss"]
        assert np.isfinite(first) and np.isfinite(last)
        assert last < first
        # snapshots written
        assert (tmp_path / "parent_8.ckpt").exists()


class TestInstanceFrameSampler:
    def test_instance_ids_and_overflow(self):
        from e_osvos_tpu.engine.parent_trainer import InstanceFrameSampler

        index = SyntheticVOSIndex(num_sequences=2, num_frames=3, size=SIZE,
                                  num_objects=2, seed=1)
        sampler = InstanceFrameSampler([index], SIZE, max_objects=1, seed=0)
        imgs, labels, seeds = sampler.sample_batch(6)
        assert labels.shape == (6,) + SIZE
        # with max_objects=1, the second instance must land in 255-ignore,
        # never in background or slot 2
        assert set(np.unique(labels)) <= {0, 1, 255}
        sampler2 = InstanceFrameSampler([index], SIZE, max_objects=2, seed=0)
        _, labels2, _ = sampler2.sample_batch(6)
        assert set(np.unique(labels2)) <= {0, 1, 2, 255}
        assert 2 in np.unique(labels2)  # both slots populated somewhere


@pytest.mark.slow
class TestDetectionParentTrainer:
    def test_detection_loss_decreases(self, tmp_path):
        """Supervised Mask R-CNN parent training (the in-framework analog
        of the reference's COCO pre-training, helper_func.py:339-346): the
        jitted SPMD step consumes instance-id labels and the loss falls."""
        from e_osvos_tpu.engine.parent_trainer import InstanceFrameSampler
        from e_osvos_tpu.models import MaskRCNN, RoIConfig, RPNConfig

        hw = (64, 64)
        index = SyntheticVOSIndex(num_sequences=2, num_frames=4, size=hw,
                                  num_objects=2, seed=5)
        sampler = InstanceFrameSampler([index], hw, max_objects=2, seed=0)
        model = MaskRCNN(
            arch="resnet10", backbone_norm="group4",
            rpn=RPNConfig(anchor_sizes=(8, 16, 32, 64, 128),
                          pre_nms_top_n=64, post_nms_top_n=32,
                          batch_size_per_image=32),
            roi=RoIConfig(batch_size_per_image=16, detections_per_img=2),
        )
        params = model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            jnp.zeros((1,) + hw + (3,)),
        )
        trainer = ParentTrainer(
            model_apply=model.apply,
            params=params,
            sampler=sampler,
            cfg=ParentTrainConfig(
                task="detection", max_objects=2,
                num_iters=30, batch_size=8, lr=1e-3, crop_size=hw,
                log_interval=5, snapshot_interval=100,
                save_dir=str(tmp_path), augment=MILD,
            ),
            mesh=make_mesh(num_tasks=4),
            logger=MetricsLogger(echo=False),
        )
        # detection loss is noisy over the first iterations (the RPN
        # regression head spikes while objectness calibrates), so compare
        # windowed means, not two single-batch samples
        losses = [trainer.run(1)["loss"] for _ in range(30)]
        assert np.isfinite(losses).all()
        assert np.mean(losses[-4:]) < np.mean(losses[:4])
