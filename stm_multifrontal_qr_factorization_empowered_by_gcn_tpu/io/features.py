"""Graph feature generation — the ``-Dwrite_graph`` capability of the
reference C reader (``STMMQR/src/core/SparseCore_read_write.c:1040-1190``),
vectorized with scipy sparse algebra instead of the C triple loop.

Per node k (treating the sparse matrix as a directed graph, edge i→j per
nonzero A[i,j], diagonal excluded from degrees):

* ``rdeg[k]``   — out-degree (#offdiag nonzeros in row k)
* ``cdeg[k]``   — in-degree  (#offdiag nonzeros in column k)
* ``eli_add[k]``— fill-in proxy: ``cdeg[k]·rdeg[k] − |{(u,v) ∈ T : u ∈
  in(k), v ∈ out(k)}|`` — the number of *new* edges created by eliminating
  node k (reference ``:1098-1146``; note the C scan runs over ALL triplets
  including diagonals, which we reproduce exactly).

Per graph, 10 global stats (reference ``:1171-1183``): ``n, nnz, density,
avg_out_degree, frac_max_outdeg, frac_max_indeg, max/min out/in degree``.

Vectorized ``eli_add``: with B the 0/1 pattern (incl. diagonal) and B̃ the
offdiagonal pattern, the subtracted count is
``count_k = Σ_{u,v} B̃[u,k]·B[u,v]·B̃[k,v] = [(B̃ᵀ B) ∘ B̃]_k·`` — one SpGEMM
plus an elementwise mask, O(nnz·avg_deg) instead of the C code's
O(n·nnz·deg²).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import scipy.sparse as sp

from .mtx import Triplets, read_mtx


class GraphFeatures(NamedTuple):
    # node table columns (reference QR_Node.txt: graph_id, k, rdeg, cdeg, eli_add)
    rdeg: np.ndarray
    cdeg: np.ndarray
    eli_add: np.ndarray
    # 10 global stats (reference QR_extinfo.txt columns after graph_id)
    extinfo: np.ndarray
    # raw edges (reference QR_Edge.txt: graph_id, i, j, val)
    rows: np.ndarray
    cols: np.ndarray
    vals: np.ndarray
    nrow: int
    ncol: int


def compute_features(t: Triplets) -> GraphFeatures:
    """Per-node out/in degree + elimination fill estimate and the 10 global stats, bit-matched to the C generator (reference ``SparseCore_read_write.c:1040-1190``)."""
    nrow, ncol = t.nrow, t.ncol
    rows, cols, vals = t.rows, t.cols, t.vals
    nnz = rows.shape[0]

    offdiag = rows != cols
    rdeg = np.bincount(rows[offdiag], minlength=nrow).astype(np.int64)
    cdeg = np.bincount(cols[offdiag], minlength=ncol).astype(np.int64)

    n = max(nrow, ncol)
    ones = np.ones(nnz, dtype=np.float64)
    B = sp.csr_matrix((ones, (rows, cols)), shape=(n, n))
    B.data[:] = 1.0  # duplicates (if any) collapse to pattern, like a set
    Bt = sp.csr_matrix(
        (np.ones(int(offdiag.sum())), (rows[offdiag], cols[offdiag])),
        shape=(n, n),
    )
    Bt.data[:] = 1.0
    # count_k = [(B̃ᵀ B) ∘ B̃] row-sums
    D = (Bt.T @ B).multiply(Bt)
    count = np.asarray(D.sum(axis=1)).ravel()

    k_max = ncol  # the C loop iterates k over ncol (quirk kept; see docstring)
    rdeg_k = _pad_to(rdeg, k_max)
    cdeg_k = _pad_to(cdeg, k_max)
    eli_add = cdeg_k * rdeg_k - count[:k_max].astype(np.int64)

    # --- extinfo (reference :1171-1183) ---------------------------------
    # NOTE the C quirks, reproduced bit-for-bit: min/max of rdeg are taken
    # over k < ncol; avg degree divides the k<ncol partial sum by nrow;
    # max-degree fractions divide counts (over k<ncol) by nrow.
    max_rdeg, min_rdeg = int(rdeg_k.max()), int(rdeg_k.min())
    max_cdeg, min_cdeg = int(cdeg_k.max()), int(cdeg_k.min())
    rdeg_sum = int(rdeg_k.sum())
    max_rdeg_frac = float(np.sum(rdeg_k == max_rdeg)) / nrow
    max_cdeg_frac = float(np.sum(cdeg_k == max_cdeg)) / nrow
    density = nnz / float(nrow * ncol)
    avg_rdeg = rdeg_sum / float(nrow)
    extinfo = np.array(
        [
            nrow, nnz, density, avg_rdeg, max_rdeg_frac, max_cdeg_frac,
            max_rdeg, min_rdeg, max_cdeg, min_cdeg,
        ],
        dtype=np.float64,
    )

    return GraphFeatures(
        rdeg=rdeg_k, cdeg=cdeg_k, eli_add=eli_add, extinfo=extinfo,
        rows=rows, cols=cols, vals=vals, nrow=nrow, ncol=ncol,
    )


def features_from_mtx(path: str) -> GraphFeatures:
    """Read a MatrixMarket file and compute its GCN input features (the ``-Dwrite_graph`` flow of reference ``qrtest.c``)."""
    return compute_features(read_mtx(path))


def node_feature_table(gf: GraphFeatures, graph_id: int) -> np.ndarray:
    """Rows of the reference ``QR_Node.txt`` / ``classorder.content`` format:
    ``graph_id, k, rdeg, cdeg, eli_add`` (``SparseCore_read_write.c:1163``)."""
    k = gf.rdeg.shape[0]
    out = np.empty((k, 5), dtype=np.float64)
    out[:, 0] = graph_id
    out[:, 1] = np.arange(k)
    out[:, 2] = gf.rdeg
    out[:, 3] = gf.cdeg
    out[:, 4] = gf.eli_add
    return out


def edge_table(gf: GraphFeatures, graph_id: int) -> np.ndarray:
    """Rows of ``QR_Edge.txt`` / ``classorder.cites``: ``graph_id, i, j, val``
    (``SparseCore_read_write.c:1066``)."""
    e = gf.rows.shape[0]
    out = np.empty((e, 4), dtype=np.float64)
    out[:, 0] = graph_id
    out[:, 1] = gf.rows
    out[:, 2] = gf.cols
    out[:, 3] = gf.vals
    return out


def extinfo_row(gf: GraphFeatures, graph_id: int) -> np.ndarray:
    """The 10-value global-feature row in ``QR_extinfo.txt`` order (reference ``SparseCore_read_write.c:1180-1183``)."""
    return np.concatenate([[graph_id], gf.extinfo])


def _pad_to(a: np.ndarray, k: int) -> np.ndarray:
    if a.shape[0] >= k:
        return a[:k]
    return np.pad(a, (0, k - a.shape[0]))
