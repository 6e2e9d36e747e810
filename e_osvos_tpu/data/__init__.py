"""Data substrate: host-side dataset indexers + on-device preprocessing."""

from e_osvos_tpu.data.datasets import (  # noqa: F401
    DAVISIndex,
    ObjectGroup,
    PreloadedIndex,
    VOSSequence,
    YouTubeVOSIndex,
    binarize_label,
    load_image,
    load_label,
    read_split_file,
)
from e_osvos_tpu.data.synthetic import SyntheticVOSIndex  # noqa: F401
from e_osvos_tpu.data.voc import VOC2012Index  # noqa: F401
from e_osvos_tpu.data import splits, transforms  # noqa: F401
