"""Engines: one-shot evaluators (dense + detection), meta-trainer, parent
pre-training (SURVEY.md §2.1 orchestration layer rebuilt)."""

from e_osvos_tpu.engine.one_shot import (  # noqa: F401
    OneShotConfig,
    OneShotEvaluator,
    fine_tune_on_support,
    merge_objects,
    segment_frames,
)
from e_osvos_tpu.engine.one_shot_detection import (  # noqa: F401
    DetectionOneShotConfig,
    DetectionOneShotEvaluator,
)
from e_osvos_tpu.engine.meta_trainer import (  # noqa: F401
    MetaTrainConfig,
    MetaTrainer,
)
from e_osvos_tpu.engine.parent_trainer import (  # noqa: F401
    FrameSampler,
    InstanceFrameSampler,
    ParentTrainConfig,
    ParentTrainer,
)
