"""Multi-host (DCN) initialization helpers.

The reference is single-host only — its world is
``torch.cuda.device_count()`` (/root/reference/src/train_meta.py:132;
SURVEY.md §2.5 "Multi-node: ABSENT"). In this framework multi-host comes
from ``jax.distributed``: after ``initialize()``, ``jax.devices()`` spans
every host's chips and the same ``make_mesh``/``shard_map`` meta step runs
unchanged — the task-axis psum rides ICI within a slice and DCN across
slices, with no code changes in the training step.

Usage (one call per host process, before any jax computation)::

    from e_osvos_tpu.parallel import multihost
    multihost.initialize()          # env-driven (TPU pods autoconfigure)
    mesh = make_mesh()              # now spans all hosts' devices
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed. On TPU pods all arguments are inferred
    from the environment; pass them explicitly for CPU/GPU clusters."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def is_multihost() -> bool:
    return jax.process_count() > 1


def local_task_slice(meta_batch_size: int) -> slice:
    """The meta-batch rows this host must materialize when the task batch
    is sharded over a multi-host mesh: with B tasks over P processes, host
    p feeds rows [p·B/P, (p+1)·B/P) (jax.make_array_from_process_local_data
    handles placement from there)."""
    per = meta_batch_size // jax.process_count()
    p = jax.process_index()
    return slice(p * per, (p + 1) * per)
