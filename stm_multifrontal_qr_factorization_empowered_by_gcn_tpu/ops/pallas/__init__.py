"""Pallas TPU kernels (see the module docstrings for the design rationale;
the hot aggregation default is the scatter-free ELL path in ``ops.ell`` —
these kernels serve the sorted-COO case where format conversion isn't
amortized)."""
from .segment import (
    CHUNK,
    WINDOW,
    pallas_available,
    segment_sum_sorted_pallas,
    spmm_coo_sorted_pallas,
)

__all__ = [
    "CHUNK",
    "WINDOW",
    "pallas_available",
    "segment_sum_sorted_pallas",
    "spmm_coo_sorted_pallas",
]
