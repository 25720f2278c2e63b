from .kernels import (
    sample_adjacency,
    sample_adjacency_block,
    build_block_layout,
    weighted_sample_adjacency,
    cal_next_prob,
    build_row_cdf,
)
from .sampler import NeighborSampler, SampledBatch, Adj, DenseBlock

__all__ = [
    "sample_adjacency",
    "sample_adjacency_block",
    "build_block_layout",
    "weighted_sample_adjacency",
    "cal_next_prob",
    "build_row_cdf",
    "NeighborSampler",
    "SampledBatch",
    "Adj",
    "DenseBlock",
]
