"""Runtime/quality analysis harness: J&F and s/frame vs fine-tune steps.

Rebuild of the reference's paper-figure notebook data collection
(/root/reference/src/visualization.ipynb cells 3/5: fps and J&F for
T ∈ {1,5,10,20,50,100,500} fine-tune steps — the e-OSVOS-T runtime curve,
BASELINE.md rows 9-10). Produces jsonl rows consumable by any plotting
tool; no notebook or Visdom dependency."""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

from e_osvos_tpu.utils.logging import MetricsLogger


def sweep_fine_tune_steps(
    make_evaluator: Callable[[int], Any],
    index,
    seq_names: Sequence[str],
    meta_params,
    key,
    steps: Sequence[int] = (1, 5, 10, 20, 50, 100),
    logger: Optional[MetricsLogger] = None,
) -> List[Dict[str, float]]:
    """For each T in ``steps``: build an evaluator with num_epochs=T via
    ``make_evaluator(T)``, run the sequences, record J/F means and
    time-per-frame (timing methodology: per-sequence wall clock over frames,
    evaluate.py:152,319-320,436)."""
    rows = []
    for T in steps:
        ev = make_evaluator(T)
        js, fs, total_time, total_frames = [], [], 0.0, 0
        for name in seq_names:
            t0 = time.perf_counter()
            res = ev.eval_sequence(index, name, meta_params, key)
            dt = time.perf_counter() - t0
            n = res["merged"].shape[0]
            total_time += dt
            total_frames += n
            js.append(res["J_mean"])
            fs.append(res["F_mean"])
        row = {
            "fine_tune_steps": int(T),
            "J_mean": float(np.nanmean(js)),
            "F_mean": float(np.nanmean(fs)),
            "JF_mean": float((np.nanmean(js) + np.nanmean(fs)) / 2),
            "time_per_frame": total_time / max(total_frames, 1),
            "fps": total_frames / max(total_time, 1e-9),
        }
        rows.append(row)
        if logger is not None:
            logger.log("sweep_T", **row)
    return rows
