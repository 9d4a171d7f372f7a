from agrl_tpu.core.checkpoint import (
    AsyncCheckpointer,
    load_checkpoint,
    load_variables,
    load_weights_partial,
    save_checkpoint,
)

__all__ = [
    "AsyncCheckpointer", "load_checkpoint", "load_variables",
    "load_weights_partial", "save_checkpoint",
]
