from agrl_tpu.core.checkpoint import (
    load_checkpoint,
    load_variables,
    load_weights_partial,
    save_checkpoint,
)

__all__ = [
    "load_checkpoint", "load_variables", "load_weights_partial",
    "save_checkpoint",
]
