"""Flax model zoo: ResNet backbones, DeepLab heads, FPN, Mask R-CNN
(SURVEY.md §2.2 rebuilt TPU-native)."""

from e_osvos_tpu.models.resnet import ResNet  # noqa: F401
from e_osvos_tpu.models.deeplab import (  # noqa: F401
    ARCHITECTURES,
    DeepLabV3,
    DeepLabV3Plus,
    build_model,
)
from e_osvos_tpu.models.fpn import FPN  # noqa: F401
from e_osvos_tpu.models.mask_rcnn import (  # noqa: F401
    Detections,
    MaskRCNN,
    RoIConfig,
)
from e_osvos_tpu.models.rpn import RPNConfig  # noqa: F401
from e_osvos_tpu.models import fuse, torch_import  # noqa: F401

ARCHITECTURES["MaskRCNN"] = MaskRCNN
