"""Compute ops: losses, J/F metrics, and the detection kernels (boxes,
padded NMS, ROI-align) — the reference's native torchvision/CUDA surface
rebuilt as static-shape XLA (SURVEY.md §2.4)."""

from e_osvos_tpu.ops import bits, boxes, losses, metrics, nms, roi_align  # noqa: F401
