"""MatrixMarket reader — capability of the reference C reader
(``STMMQR/src/core/SparseCore_read_write.c`` read_header/read_triplet).

Thin wrapper over ``scipy.io.mmread`` with symmetric→general expansion
matching the C reader's ``prefer == 1`` behaviour (symmetric inputs are
mirrored into an unsymmetric triplet set; diagonal entries stay single).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import scipy.io
import scipy.sparse as sp


class Triplets(NamedTuple):
    rows: np.ndarray   # int64 [nnz]
    cols: np.ndarray   # int64 [nnz]
    vals: np.ndarray   # float64 [nnz]
    nrow: int
    ncol: int
    symmetric: bool    # whether the file declared symmetry


def read_mtx(path: str, *, expand_symmetric: bool = True) -> Triplets:
    """Read a MatrixMarket file into (possibly symmetry-expanded) triplets."""
    with open(path, "rb") as f:
        header = f.readline().decode("ascii", "replace").lower()
    symmetric = "symmetric" in header or "hermitian" in header or "skew" in header

    m = scipy.io.mmread(path)  # scipy already mirrors symmetric storage
    coo = sp.coo_matrix(m)
    rows = coo.row.astype(np.int64)
    cols = coo.col.astype(np.int64)
    vals = np.asarray(coo.data, dtype=np.float64)
    if vals.size == 0 and rows.size:  # pattern matrices
        vals = np.ones(rows.shape[0], dtype=np.float64)

    if symmetric and not expand_symmetric:
        keep = rows >= cols  # lower triangle as stored
        rows, cols, vals = rows[keep], cols[keep], vals[keep]
    return Triplets(rows, cols, vals, int(coo.shape[0]), int(coo.shape[1]), symmetric)


def to_csr(t: Triplets) -> sp.csr_matrix:
    """Triplets -> scipy CSR (duplicates summed, the MatrixMarket convention)."""
    return sp.csr_matrix(
        (t.vals, (t.rows, t.cols)), shape=(t.nrow, t.ncol)
    )
