from agrl_tpu.ops.distmat import (
    compute_distmat,
    cosine_distmat,
    euclidean_sq_distmat,
    sharded_distmat,
)
from agrl_tpu.ops.graph_conv import graph_propagate_pallas, graph_propagate_reference
from agrl_tpu.ops.graph_conv_v2 import graph_propagate_pallas_v2
from agrl_tpu.ops.rank import (
    evaluate_mars_device,
    market1501_cmc_map,
    streaming_topk,
)
from agrl_tpu.ops.triplet import hard_mine_pallas

__all__ = [
    "compute_distmat",
    "cosine_distmat",
    "euclidean_sq_distmat",
    "evaluate_mars_device",
    "graph_propagate_pallas",
    "graph_propagate_pallas_v2",
    "graph_propagate_reference",
    "hard_mine_pallas",
    "market1501_cmc_map",
    "sharded_distmat",
    "streaming_topk",
]
