"""e-OSVOS-TPU: TPU-native meta-learned one-shot video object segmentation.

A ground-up JAX/XLA/Pallas/pjit framework with the capabilities of the
e-OSVOS reference ("Make One-Shot Video Object Segmentation Efficient Again",
NeurIPS 2020; reference implementation surveyed in /root/repo/SURVEY.md):

- segmentation model zoo (DeepLabV3 / DeepLabV3+ / Mask R-CNN) in Flax
- a learned optimizer (per-neuron learning rates + learned model init) whose
  inner fine-tune loop compiles to a single jitted ``lax.scan``
- one-shot evaluation with online adaptation and multi-object batching
- meta-training with the task batch sharded over a TPU mesh (``shard_map`` +
  ``psum`` meta-gradient reduction)
- native J/F metrics, padded NMS / ROI-align kernels, on-device preprocessing

Subpackages
-----------
``ops``        losses, metrics, box/NMS/ROI kernels, device preprocessing
``models``     Flax model zoo (ResNet backbones, DeepLab heads, Mask R-CNN)
``meta_optim`` learned-optimizer core: lr trees, jitted fine-tune, BPTT
``data``       dataset indexers (DAVIS / YouTube-VOS / synthetic), host decode
``parallel``   mesh construction + shard_map task parallelism
``engine``     one-shot evaluator, meta-trainer, parent pre-training, ckpt
``utils``      jsonl metrics logging, timers, misc
"""

__version__ = "0.1.0"
