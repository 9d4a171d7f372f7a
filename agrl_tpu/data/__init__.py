from agrl_tpu.data.graph import GraphBuilder, build_adjacency
from agrl_tpu.data.sampling import sample_clip_indices

__all__ = ["GraphBuilder", "build_adjacency", "sample_clip_indices"]
