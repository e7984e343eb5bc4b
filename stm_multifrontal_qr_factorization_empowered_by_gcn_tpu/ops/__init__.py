"""Compute kernels: segment reductions, ELL/BSR SpMM with execution plans,
SDDMM, sparse softmax — the torch-scatter/torch-sparse replacement,
Pallas-accelerated on TPU.
"""
from .ell import (
    EllAttn,
    EllGraph,
    ell_attn_from_coo,
    ell_attn_pair_from_coo,
    ell_from_coo,
    ell_pair_from_coo,
    spmm_ell,
    spmm_ell_attn,
    spmm_ell_max,
    spmm_ell_mean,
    spmm_ell_sum,
)
from .bsr import BsrMatrix, bsr_from_coo, bsr_matmul, bsr_transpose_coo, spmm_bsr
from .norm import gcn_norm
from .plan import (
    SpmmPlan,
    build_gcn_plan,
    build_mean_plan,
    build_spmm_plan,
    gcn_norm_np,
)
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
    "EllAttn", "EllGraph", "ell_attn_from_coo", "ell_attn_pair_from_coo",
    "ell_from_coo", "ell_pair_from_coo",
    "spmm_ell", "spmm_ell_attn", "spmm_ell_max", "spmm_ell_mean", "spmm_ell_sum",
    "BsrMatrix", "bsr_from_coo", "bsr_matmul", "bsr_transpose_coo", "spmm_bsr",
    "SpmmPlan", "build_spmm_plan", "build_gcn_plan", "build_mean_plan",
    "gcn_norm_np",
    "gcn_norm", "attention_coefficients", "sddmm",
    "segment_sum", "segment_mean", "segment_max", "segment_min",
    "segment_softmax", "segment_count", "aggregate",
    "sharded_aggregate", "sharded_segment_softmax",
    "spmm_coo", "spmm_dense", "adjacency_dense", "best_spmm",
]
