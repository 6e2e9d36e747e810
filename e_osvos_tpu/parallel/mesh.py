"""Device-mesh construction for task-parallel meta-training.

The reference's parallelism is one OS process per meta-shard with
shared-memory gradient accumulation and a polling control plane
(/root/reference/src/train_meta.py:132-201, SURVEY.md §2.5/§5.8). The
TPU-native equivalent is a single SPMD program: the meta-batch-of-tasks axis
is a mesh axis named ``task``; gradient accumulation is a ``psum`` over ICI;
the control plane disappears.

A second (optional) ``data`` axis is reserved for sharding the within-task
batch (augmented support copies / query frames) when a task's footprint
exceeds one chip — the moral analogue of the reference's intra-eval batching.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TASK_AXIS = "task"
DATA_AXIS = "data"


def make_mesh(
    num_tasks: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D (or 2-D) mesh over the available devices.

    ``num_tasks``: size of the ``task`` axis (must divide the device count);
    remaining devices fold into the ``data`` axis. Default: all devices on
    the task axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if num_tasks is None:
        num_tasks = n
    if n % num_tasks != 0:
        raise ValueError(f"{num_tasks} task shards do not divide {n} devices")
    arr = np.asarray(devices).reshape(num_tasks, n // num_tasks)
    return Mesh(arr, (TASK_AXIS, DATA_AXIS))


def task_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for arrays with a leading task axis."""
    return NamedSharding(mesh, P(TASK_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_task_batch(mesh: Mesh, batch):
    """Place a host TaskBatch (leading axis = task) onto the mesh, sharded
    over the ``task`` axis; meta-params stay replicated."""
    sh = task_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
