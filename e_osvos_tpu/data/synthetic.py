"""Synthetic "moving shapes" VOS fixture.

SURVEY.md §4 calls for a 2-frame moving-square fixture so the whole
fine-tune → propagate → J/F pipeline runs end-to-end without DAVIS on disk.
This generates an in-memory dataset with the same indexer interface as
DAVISIndex/YouTubeVOSIndex (datasets.py): colored shapes translating over a
textured background, object ids 1..K in the label maps.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from e_osvos_tpu.data.datasets import ObjectGroup, VOSSequence, _groups_for_ids


def _draw_square(label: np.ndarray, img: np.ndarray, cy: int, cx: int,
                 half: int, obj_id: int, color: np.ndarray) -> None:
    h, w = label.shape
    y0, y1 = max(cy - half, 0), min(cy + half, h)
    x0, x1 = max(cx - half, 0), min(cx + half, w)
    if y1 > y0 and x1 > x0:
        label[y0:y1, x0:x1] = obj_id
        img[y0:y1, x0:x1] = color


class SyntheticVOSIndex:
    """In-memory moving-squares dataset with the VOS indexer interface."""

    def __init__(
        self,
        num_sequences: int = 2,
        num_frames: int = 4,
        size: Tuple[int, int] = (64, 64),
        num_objects: int = 1,
        multi_object: str = "single_id",
        seed: int = 0,
        name_prefix: str = "seq",
    ):
        rng = np.random.RandomState(seed)
        h, w = size
        self.sequences: Dict[str, VOSSequence] = {}
        self._images: Dict[str, List[np.ndarray]] = {}
        self._labels: Dict[str, List[Optional[np.ndarray]]] = {}

        for s in range(num_sequences):
            name = f"{name_prefix}{s:02d}"
            imgs, labels = [], []
            # background: smooth random gradient texture
            bg = (
                rng.randint(40, 160, (3,))[None, None, :]
                + np.linspace(0, 60, w)[None, :, None]
                + np.linspace(0, 40, h)[:, None, None]
            ).astype(np.float32)
            starts = [
                (rng.randint(h // 4, 3 * h // 4), rng.randint(w // 4, 3 * w // 4))
                for _ in range(num_objects)
            ]
            vels = [
                (rng.randint(-3, 4), rng.randint(-3, 4)) for _ in range(num_objects)
            ]
            colors = [rng.randint(0, 255, (3,)).astype(np.float32)
                      for _ in range(num_objects)]
            half = max(min(h, w) // 8, 3)
            for t in range(num_frames):
                img = bg + rng.normal(0, 3, (h, w, 3)).astype(np.float32)
                label = np.zeros((h, w), np.uint8)
                for k in range(num_objects):
                    cy = starts[k][0] + vels[k][0] * t
                    cx = starts[k][1] + vels[k][1] * t
                    _draw_square(label, img, cy, cx, half, k + 1, colors[k])
                imgs.append(np.clip(img, 0, 255).astype(np.uint8))
                labels.append(label)
            ids = list(range(1, num_objects + 1))
            groups = _groups_for_ids(ids, 0, multi_object)
            self.sequences[name] = VOSSequence(
                name=name,
                image_paths=[f"<mem>/{name}/{t:05d}.jpg" for t in range(num_frames)],
                label_paths=[f"<mem>/{name}/{t:05d}.png" for t in range(num_frames)],
                object_groups=groups,
                num_objects=num_objects,
            )
            self._images[name] = imgs
            self._labels[name] = labels

    def get_image(self, seq: str, idx: int) -> np.ndarray:
        return self._images[seq][idx]

    def get_label(self, seq: str, idx: int) -> Optional[np.ndarray]:
        return self._labels[seq][idx]
