"""Sequence frame loading with native threaded prefetch.

The reference hides decode latency in DataLoader worker processes
(num_workers, SURVEY.md §2.3). Here the native C++ pool (cpp/vos_loader.cc)
decodes a whole sequence's JPEGs in parallel threads while the host stacks
results — used by the evaluators to materialize the [T,H,W,3] frame tensor
a sequence at a time. Falls back to sequential decode when the native
library or real files are unavailable (synthetic in-memory indexes)."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from e_osvos_tpu.data import native


def load_frames(index, seq_name: str, num_threads: Optional[int] = None) -> np.ndarray:
    """[T,H,W,3] uint8 frame stack for one sequence."""
    seq = index.sequences[seq_name]
    T = len(seq)
    paths = getattr(seq, "image_paths", None)
    use_native = (
        paths is not None
        and native.available()
        and all(p.lower().endswith((".jpg", ".jpeg")) and os.path.exists(p)
                for p in paths)
    )
    if not use_native:
        return np.stack([index.get_image(seq_name, t) for t in range(T)])

    n_threads = num_threads or min(8, (os.cpu_count() or 1) * 2)
    # probe dims from the first frame, preallocate slots at that size
    first = native.decode_jpeg(paths[0])
    h, w = first.shape[:2]
    out = np.empty((T, h, w, 3), np.uint8)
    out[0] = first
    pool = native.PrefetchLoader(
        num_threads=n_threads, num_slots=min(T, 32), max_hw=(h, w)
    )
    try:
        free = list(range(pool.num_slots))
        pending: dict = {}  # frame index -> slot, in submission order
        for t in range(1, T):
            if not free:
                # drain the oldest in-flight frame to recycle its slot
                t0, s0 = next(iter(pending.items()))
                out[t0] = pool.wait(s0)
                del pending[t0]
                free.append(s0)
            slot = free.pop()
            pool.submit(slot, paths[t], kind=0)
            pending[t] = slot
        for t0, s0 in pending.items():
            out[t0] = pool.wait(s0)
    finally:
        pool.close()
    return out
