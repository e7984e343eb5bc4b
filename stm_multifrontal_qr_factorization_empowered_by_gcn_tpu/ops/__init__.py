from .segment import (
    segment_sum, segment_mean, segment_max, segment_min,
    segment_softmax, segment_count, aggregate,
)
from .norm import gcn_norm
from .spmm import spmm_coo, spmm_dense, adjacency_dense

__all__ = [
    "segment_sum", "segment_mean", "segment_max", "segment_min",
    "segment_softmax", "segment_count", "aggregate",
    "gcn_norm", "spmm_coo", "spmm_dense", "adjacency_dense",
]
