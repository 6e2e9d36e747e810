"""Checkpoint / resume for meta-training state.

Reference behavior (/root/reference/src/train_meta.py:278-286,
src/util/evaluate.py:361-382; SURVEY.md §5.4): pickled dicts holding the
MetaOptimizer state (which implicitly contains the learned model init),
saved as ``last_meta_iter.model`` every vis_interval and
``best_<dataset>_meta_iter.model`` on J improvement; the OUTER optimizer
state is *not* saved (a bug this rebuild fixes).

Here: the full training state — meta-params (learned init + lrs), outer
optax state, and step counters — is serialized with flax msgpack into a
single file, with atomic rename so a crash mid-save never corrupts the
latest checkpoint. ``best_*`` / ``last_*`` naming is kept.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _to_numpy(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: Any, metadata: Optional[Dict] = None) -> str:
    """Serialize a pytree (+ JSON metadata sidecar) atomically."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = serialization.to_bytes(_to_numpy(state))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)
    if metadata is not None:
        mtmp = path + ".json.tmp"
        with open(mtmp, "w") as f:
            json.dump(metadata, f)
        os.replace(mtmp, path + ".json")
    return path


def load_checkpoint(path: str, target: Any) -> Tuple[Any, Optional[Dict]]:
    """Restore a pytree saved by save_checkpoint into the structure of
    ``target`` (a template with matching treedef/shapes)."""
    with open(path, "rb") as f:
        state = serialization.from_bytes(target, f.read())
    meta = None
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return state, meta
