"""Structured metrics logging: jsonl + stdout, no server dependency.

Replaces the reference's Visdom dashboard + Manager-dict metric plumbing
(/root/reference/src/util/vis_utils.py:11-141, visualize.py:20-143,
train_meta.py:207-323; SURVEY.md §5.5). The metric vocabulary is kept
(meta_loss, J/F mean/recall/decay, init_J, time_per_frame, lr stats) so runs
remain comparable with the reference's plots.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


def _to_jsonable(v: Any) -> Any:
    try:
        import numpy as np

        if isinstance(v, (np.integer,)):
            return int(v)
        if isinstance(v, (np.floating,)):
            return float(v)
        if isinstance(v, np.ndarray):
            return v.tolist()
    except Exception:  # pragma: no cover
        pass
    if hasattr(v, "item") and getattr(v, "ndim", None) == 0:
        return v.item()
    return v


class MetricsLogger:
    """Append-only jsonl metrics stream with optional stdout echo."""

    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self.path = path
        self.echo = echo
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a")
        else:
            self._fh = None

    def log(self, event: str, step: Optional[int] = None, **metrics) -> Dict:
        rec = {"ts": time.time(), "event": event}
        if step is not None:
            rec["step"] = int(step)
        rec.update({k: _to_jsonable(v) for k, v in metrics.items()})
        line = json.dumps(rec)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self.echo:
            print(line, flush=True)
        return rec

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None


class Timer:
    """Wall-clock phase timer (the reference times meta-iterations and
    per-sequence eval with timeit.default_timer, SURVEY.md §5.1)."""

    def __init__(self):
        self._start: Dict[str, float] = {}
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    def start(self, phase: str):
        self._start[phase] = time.perf_counter()

    def stop(self, phase: str) -> float:
        dt = time.perf_counter() - self._start.pop(phase)
        self.totals[phase] = self.totals.get(phase, 0.0) + dt
        self.counts[phase] = self.counts.get(phase, 0) + 1
        return dt

    def __getitem__(self, phase: str) -> float:
        return self.totals.get(phase, 0.0)
