from e_osvos_tpu.ops import losses, metrics  # noqa: F401
