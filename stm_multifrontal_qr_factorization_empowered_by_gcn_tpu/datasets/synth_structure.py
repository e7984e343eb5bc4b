"""Deterministic sparse-matrix structure synthesis from global statistics.

The reference repo ships per-graph global features + labels for the 408
training matrices (``data/Classorder/raw/QR_extinfo.txt``/``graph_y.txt``)
but NOT the per-node/per-edge files — those are regenerated from the actual
SuiteSparse matrices by the C feature generator, and the matrices themselves
are not in the repo (SURVEY.md §3.6).  In a zero-egress environment we
instead synthesize a sparse pattern per graph that matches the *published*
statistics (n, nnz, average degree, degree extremes) and run the verified
feature generator on it.  Synthesis is deterministic per ``(graph_id, seed)``.

Shape of the synthetic pattern: full diagonal + near-diagonal band with a
lognormal out-degree profile — the typical SuiteSparse FEM/circuit structure
that the training corpus (GCNdata_408.txt) is drawn from.
"""
from __future__ import annotations

import numpy as np

from ..io.features import GraphFeatures, compute_features
from ..io.mtx import Triplets


def synthesize_triplets(
    n: int,
    nnz: int,
    avg_deg: float,
    max_rdeg: int,
    min_rdeg: int,
    max_cdeg: int,
    min_cdeg: int,
    *,
    seed: int = 0,
) -> Triplets:
    rng = np.random.default_rng(np.random.SeedSequence([seed, 0xC1A55]))
    n = int(n)
    offdiag_target = max(int(nnz) - n, 0)

    if offdiag_target == 0:
        rows = cols = np.arange(n, dtype=np.int64)
        return Triplets(rows, cols, np.ones(n), n, n, False)

    mean_deg = max(offdiag_target / n, 0.1)
    # lognormal out-degrees, clipped to the published extremes
    sigma = min(1.2, max(0.2, np.log(max(max_rdeg, 2) / mean_deg) / 3.0))
    deg = rng.lognormal(np.log(mean_deg), sigma, size=n)
    deg = np.clip(np.round(deg), max(min_rdeg, 0), max(max_rdeg, 1)).astype(np.int64)
    # force at least one node to carry the published max out-degree
    deg[rng.integers(n)] = min(max_rdeg, n - 1)
    # rescale to hit the target edge count
    total = int(deg.sum())
    if total > 0:
        deg = np.round(deg * (offdiag_target / total)).astype(np.int64)
    deg = np.clip(deg, 0, n - 1)

    band = max(2, int(3.0 * mean_deg))
    src = np.repeat(np.arange(n, dtype=np.int64), deg)
    off = np.round(rng.laplace(0.0, band, size=src.shape[0])).astype(np.int64)
    off = np.where(off == 0, 1, off)
    dst = np.clip(src + off, 0, n - 1)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # dedupe
    key = src * n + dst
    key = np.unique(key)
    src, dst = key // n, key % n

    rows = np.concatenate([np.arange(n, dtype=np.int64), src])
    cols = np.concatenate([np.arange(n, dtype=np.int64), dst])
    vals = np.ones(rows.shape[0], dtype=np.float64)
    return Triplets(rows, cols, vals, n, n, False)


def synthesize_features(extinfo_row: np.ndarray, *, seed: int = 0) -> GraphFeatures:
    """``extinfo_row``: the 10 published stats (without the graph-id column):
    ``n, nnz, density, avg_deg, fr_max_out, fr_max_in, max_out, min_out,
    max_in, min_in`` (``SparseCore_read_write.c:1171-1183`` order)."""
    n, nnz, _dens, avg, _fo, _fi, mo, no_, mi, ni = extinfo_row[:10]
    t = synthesize_triplets(
        int(n), int(nnz), float(avg), int(mo), int(no_), int(mi), int(ni), seed=seed
    )
    return compute_features(t)
