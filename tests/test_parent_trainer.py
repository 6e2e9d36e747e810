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
