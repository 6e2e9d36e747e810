"""Mesh construction + shard_map task parallelism (SURVEY.md §2.5 rebuilt:
the reference's multiprocess/shared-memory meta-batch parallelism becomes one
SPMD program with psum gradient reduction over ICI)."""

from e_osvos_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    TASK_AXIS,
    make_mesh,
    replicated,
    shard_task_batch,
    task_sharding,
)
from e_osvos_tpu.parallel.meta_step import (  # noqa: F401
    MetaStep,
    MetaStepConfig,
    MetaStepOut,
    OuterOptimConfig,
    make_meta_step,
    make_outer_optimizer,
)
