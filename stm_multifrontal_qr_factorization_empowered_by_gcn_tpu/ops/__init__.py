from .ell import (
    EllGraph,
    ell_from_coo,
    ell_pair_from_coo,
    spmm_ell,
    spmm_ell_max,
    spmm_ell_mean,
    spmm_ell_sum,
)
from .norm import gcn_norm
from .sddmm import attention_coefficients, sddmm
from .segment import (
    aggregate,
    segment_count,
    segment_max,
    segment_mean,
    segment_min,
    segment_softmax,
    segment_sum,
    sharded_aggregate,
    sharded_segment_softmax,
)
from .spmm import adjacency_dense, best_spmm, spmm_coo, spmm_dense

__all__ = [
    "EllGraph", "ell_from_coo", "ell_pair_from_coo",
    "spmm_ell", "spmm_ell_max", "spmm_ell_mean", "spmm_ell_sum",
    "gcn_norm", "attention_coefficients", "sddmm",
    "segment_sum", "segment_mean", "segment_max", "segment_min",
    "segment_softmax", "segment_count", "aggregate",
    "sharded_aggregate", "sharded_segment_softmax",
    "spmm_coo", "spmm_dense", "adjacency_dense", "best_spmm",
]
