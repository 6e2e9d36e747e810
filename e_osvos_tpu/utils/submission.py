"""Benchmark-submission packaging.

The reference exports per-sequence indexed PNGs for DAVIS/YouTube-VOS
submission (/root/reference/src/util/evaluate.py:332-342); the official
YouTube-VOS server expects a zip containing ``Annotations/<seq>/<frame>.png``.
This module turns a predictions directory (as written by
``cli/evaluate save_preds=<dir>``: ``<dir>/<seq>/<NNNNN>.png``) into that
layout."""

from __future__ import annotations

import os
import zipfile
from typing import Optional, Sequence


def package_ytvos_submission(
    preds_dir: str,
    out_zip: str,
    sequences: Optional[Sequence[str]] = None,
    frame_names: Optional[dict] = None,
) -> int:
    """Zip ``preds_dir/<seq>/*.png`` into ``Annotations/<seq>/<name>.png``.

    ``frame_names``: optional {seq: [official frame stem, ...]} mapping —
    YT-VOS frames are named by video timestamp (e.g. ``00005``), while the
    evaluator writes sequential indices; when given, the i-th exported PNG
    is renamed to the i-th official stem. Returns the number of files
    packed."""
    seqs = sequences or sorted(
        d for d in os.listdir(preds_dir)
        if os.path.isdir(os.path.join(preds_dir, d))
    )
    count = 0
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for seq in seqs:
            files = sorted(
                f for f in os.listdir(os.path.join(preds_dir, seq))
                if f.endswith(".png")
            )
            names = frame_names.get(seq) if frame_names else None
            for i, f in enumerate(files):
                stem = names[i] if names and i < len(names) else os.path.splitext(f)[0]
                zf.write(
                    os.path.join(preds_dir, seq, f),
                    arcname=f"Annotations/{seq}/{stem}.png",
                )
                count += 1
    return count


def ytvos_frame_names(index, seq: str) -> list:
    """Official frame stems for a YouTubeVOSIndex sequence (derived from its
    image paths)."""
    return [
        os.path.splitext(os.path.basename(p))[0]
        for p in index.sequences[seq].image_paths
    ]
