from agrl_tpu.metrics.accuracy import accuracy
from agrl_tpu.metrics.distance import compute_distance_matrix
from agrl_tpu.metrics.rank import evaluate_rank
from agrl_tpu.metrics.rerank import re_ranking

__all__ = ["accuracy", "compute_distance_matrix", "evaluate_rank", "re_ranking"]
