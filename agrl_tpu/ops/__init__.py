from agrl_tpu.ops.distmat import (
    cosine_distmat,
    euclidean_sq_distmat,
    sharded_distmat,
)

__all__ = ["cosine_distmat", "euclidean_sq_distmat", "sharded_distmat"]
