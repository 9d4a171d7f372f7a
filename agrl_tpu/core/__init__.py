from agrl_tpu.core.checkpoint import (
    AsyncCheckpointer,
    fetch_global_tree,
    load_checkpoint,
    load_variables,
    load_weights_partial,
    save_checkpoint,
)

__all__ = [
    "AsyncCheckpointer", "fetch_global_tree", "load_checkpoint",
    "load_variables", "load_weights_partial", "save_checkpoint",
]
