"""Observability + persistence utilities (SURVEY.md §5.1/§5.4/§5.5)."""

from e_osvos_tpu.utils.checkpoint import (  # noqa: F401
    load_checkpoint,
    save_checkpoint,
)
from e_osvos_tpu.utils.logging import MetricsLogger, Timer  # noqa: F401
from e_osvos_tpu.utils.png import (  # noqa: F401
    davis_palette,
    load_indexed_png,
    save_indexed_png,
)
from e_osvos_tpu.utils.analysis import sweep_fine_tune_steps  # noqa: F401
from e_osvos_tpu.utils.visualize import (  # noqa: F401
    draw_boxes,
    overlay_masks,
    save_debug_overlay,
)
