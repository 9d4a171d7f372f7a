from agrl_tpu.parallel.mesh import (
    batch_sharding,
    initialize_distributed,
    make_mesh,
    param_shardings,
    place_state,
    put_global,
    put_sharded_tree,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "initialize_distributed",
    "make_mesh",
    "param_shardings",
    "place_state",
    "put_global",
    "put_sharded_tree",
    "replicated",
    "shard_batch",
]
