"""Learned-optimizer core (SURVEY.md §2.1 rebuilt TPU-native)."""

from e_osvos_tpu.meta_optim.lr_tree import (  # noqa: F401
    clamp_lr_tree,
    init_lr_tree,
    lr_per_tensor,
    lr_stats,
    mask_lrs_by_path,
    materialize_lrs,
)
from e_osvos_tpu.meta_optim.tasksets import (  # noqa: F401
    MetaTaskset,
    MetaTasksetConfig,
    TaskBatch,
    TaskSpec,
)
from e_osvos_tpu.meta_optim.meta_optimizer import (  # noqa: F401
    FineTuneState,
    MetaOptimConfig,
    MetaParams,
    clamp_meta_params,
    fine_tune,
    init_meta_params,
    inner_sgd_step,
    meta_grads,
    meta_loss,
    reset_params,
)
