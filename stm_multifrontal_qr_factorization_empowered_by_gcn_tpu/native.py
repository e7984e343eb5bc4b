"""ctypes bindings for the native ordering/partitioning library.

The reference's native ordering stack (AMD/COLAMD/METIS/NESDIS + the
brute-force fill labeler, SURVEY.md §2.2 C5-C8) maps to ``native/
ordering.cpp``.  Builds on demand with ``make`` (g++ is baked into the
image); every entry point has a documented pure-Python fallback so the
framework works without the .so (scipy RCM, no MD).
"""
from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "native")
_LIB_PATH = osp.join(_NATIVE_DIR, "libstmgcn_native.so")
_lib = None

METHOD_MIN_DEGREE = 0   # AMD role
METHOD_RCM = 1
METHOD_NESTED_DISSECTION = 2  # METIS_NodeND role
METHOD_NESDIS = 3             # NESDIS role (deep dissection, small MD leaves)
ORDERING_NAMES = {
    0: "min_degree", 1: "rcm", 2: "nested_dissection", 3: "nesdis",
}


def build_native(force: bool = False) -> bool:
    """Compile the shared library; returns True when available."""
    if osp.exists(_LIB_PATH) and not force:
        return True
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        return osp.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not osp.exists(_LIB_PATH) and not build_native():
        raise RuntimeError(
            "native library unavailable; run `make -C native` (needs g++)"
        )
    lib = ctypes.CDLL(_LIB_PATH)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.stm_order.argtypes = [
        ctypes.c_int32, ctypes.c_int64, i32p, i32p, ctypes.c_int32, i32p,
    ]
    lib.stm_symbolic_fill.argtypes = [
        ctypes.c_int32, ctypes.c_int64, i32p, i32p, i32p, i64p, i64p,
    ]
    lib.stm_col_order.argtypes = [
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int64, i32p, i32p,
        ctypes.c_int32, i32p,
    ]
    lib.stm_order_fast.argtypes = [
        ctypes.c_int32, ctypes.c_int64, i32p, i32p, ctypes.c_int32, i32p, i64p,
    ]
    lib.stm_col_order_fast.argtypes = [
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int64, i32p, i32p,
        ctypes.c_int32, i32p, i64p,
    ]
    lib.stm_bfs_partition.argtypes = [
        ctypes.c_int32, ctypes.c_int64, i32p, i32p, ctypes.c_int32, i32p,
    ]
    lib.stm_ml_partition.argtypes = [
        ctypes.c_int32, ctypes.c_int64, i32p, i32p, ctypes.c_int32, i32p,
    ]
    lib.stm_ml_partition_w.argtypes = [
        ctypes.c_int32, ctypes.c_int64, i32p, i32p, i32p, ctypes.c_int32,
        i32p,
    ]
    i64p = ctypes.POINTER(ctypes.c_int64)
    pp32 = ctypes.POINTER(ctypes.POINTER(ctypes.c_int32))
    pp64 = ctypes.POINTER(ctypes.POINTER(ctypes.c_int64))
    lib.stm_col_etree_post.argtypes = [
        ctypes.c_int32, ctypes.c_int32, i64p, i32p, i32p, i32p,
    ]
    lib.stm_qr_col_counts.argtypes = [
        ctypes.c_int32, ctypes.c_int32, i64p, i32p, i32p, i64p,
    ]
    lib.stm_qr_fronts.argtypes = [
        ctypes.c_int32, ctypes.c_int32, i64p, i32p, i32p,
        ctypes.c_int32, ctypes.c_double,
        ctypes.POINTER(ctypes.c_int32), pp32, pp32, pp32, pp64, pp32, pp64,
    ]
    lib.stm_ata_graph.argtypes = [
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int64, i32p, i32p,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int64), pp32, pp32,
    ]
    lib.stm_ata_graph.restype = ctypes.c_int
    lib.stm_free.argtypes = [ctypes.c_void_p]
    lib.stm_free.restype = None
    for f in (lib.stm_order, lib.stm_symbolic_fill, lib.stm_col_order,
              lib.stm_order_fast, lib.stm_col_order_fast,
              lib.stm_bfs_partition, lib.stm_ml_partition,
              lib.stm_ml_partition_w, lib.stm_col_etree_post,
              lib.stm_qr_fronts, lib.stm_qr_col_counts):
        f.restype = ctypes.c_int
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except RuntimeError:
        return False


def _as_i32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a), dtype=np.int32)


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def order(
    senders, receivers, num_nodes: int, method: int = METHOD_MIN_DEGREE
) -> np.ndarray:
    """Fill-reducing ordering: ``perm[k]`` = node eliminated at step k."""
    s, r = _as_i32(senders), _as_i32(receivers)
    out = np.empty(num_nodes, np.int32)
    rc = _load().stm_order(num_nodes, len(s), _ptr(s), _ptr(r), method, _ptr(out))
    if rc != 0:
        raise ValueError(f"stm_order failed (method={method})")
    return out


def order_fast(
    senders, receivers, num_nodes: int, dense_cut: int = 0
) -> np.ndarray:
    """Supervariable AMD with aggressive absorption + dense-variable
    postponement — the fast solver-path ordering mode (the reference
    amd.c's speed tricks; :func:`order` keeps the labeler's exact-order
    quotient-graph MD).  10-20x faster on the sweep matrices with ~25 %
    *less* fill on average (the tight external degrees also order
    better)."""
    s, r = _as_i32(senders), _as_i32(receivers)
    out = np.empty(num_nodes, np.int32)
    rc = _load().stm_order_fast(
        num_nodes, len(s), _ptr(s), _ptr(r), dense_cut, _ptr(out), None
    )
    if rc != 0:
        raise ValueError("stm_order_fast failed")
    return out


def col_order_fast(
    rows, cols, nrow: int, ncol: int, dense_cut: int = 0
) -> np.ndarray:
    """Fast COLAMD-role column ordering (supervariable AMD on row
    cliques); see :func:`order_fast`."""
    r, c = _as_i32(rows), _as_i32(cols)
    out = np.empty(ncol, np.int32)
    rc = _load().stm_col_order_fast(
        nrow, ncol, len(r), _ptr(r), _ptr(c), dense_cut, _ptr(out), None
    )
    if rc != 0:
        raise ValueError("stm_col_order_fast failed")
    return out


def ata_graph(rows, cols, nrow: int, ncol: int,
              row_cut: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Deduped symmetric AᵀA edge list from A's COO pattern (every row a
    clique over its columns; rows wider than ``row_cut`` skipped —
    ``<=0`` uses the labeler's ``max(16, 10*sqrt(ncol))`` cap).  The
    C++ twin of ``sparseqr.symbolic._ata_graph``; the hot host-side
    step feeding the AMD/ND orderings."""
    lib = _load()
    r, c = _as_i32(rows), _as_i32(cols)
    out_nnz = ctypes.c_int64()
    p_s = ctypes.POINTER(ctypes.c_int32)()
    p_d = ctypes.POINTER(ctypes.c_int32)()
    rc = lib.stm_ata_graph(
        nrow, ncol, len(r), _ptr(r), _ptr(c), row_cut,
        ctypes.byref(out_nnz), ctypes.byref(p_s), ctypes.byref(p_d))
    if rc != 0:
        raise ValueError("stm_ata_graph failed")
    k = int(out_nnz.value)
    s = np.ctypeslib.as_array(p_s, shape=(max(k, 1),))[:k].copy()
    d = np.ctypeslib.as_array(p_d, shape=(max(k, 1),))[:k].copy()
    lib.stm_free(ctypes.cast(p_s, ctypes.c_void_p))
    lib.stm_free(ctypes.cast(p_d, ctypes.c_void_p))
    return s, d


def symbolic_fill(senders, receivers, num_nodes: int, perm) -> Tuple[int, int]:
    """(lnz, flop proxy) of Cholesky on P A Pᵀ for elimination order ``perm``."""
    s, r, p = _as_i32(senders), _as_i32(receivers), _as_i32(perm)
    lnz = ctypes.c_int64()
    flops = ctypes.c_int64()
    rc = _load().stm_symbolic_fill(
        num_nodes, len(s), _ptr(s), _ptr(r), _ptr(p),
        ctypes.byref(lnz), ctypes.byref(flops),
    )
    if rc != 0:
        raise ValueError("stm_symbolic_fill failed")
    return int(lnz.value), int(flops.value)


def col_order(rows, cols, nrow: int, ncol: int, dense_cut: int = 0) -> np.ndarray:
    """COLAMD-role column ordering for QR (min-degree on the AᵀA pattern)."""
    r, c = _as_i32(rows), _as_i32(cols)
    out = np.empty(ncol, np.int32)
    rc = _load().stm_col_order(nrow, ncol, len(r), _ptr(r), _ptr(c), dense_cut, _ptr(out))
    if rc != 0:
        raise ValueError("stm_col_order failed")
    return out


def bfs_partition(senders, receivers, num_nodes: int, parts: int) -> np.ndarray:
    s, r = _as_i32(senders), _as_i32(receivers)
    out = np.empty(num_nodes, np.int32)
    rc = _load().stm_bfs_partition(num_nodes, len(s), _ptr(s), _ptr(r), parts, _ptr(out))
    if rc != 0:
        raise ValueError("stm_bfs_partition failed")
    return out


def ml_partition(senders, receivers, num_nodes: int, parts: int,
                 vweights=None) -> np.ndarray:
    """k-way partition via recursive multilevel bisection (HEM coarsening +
    FM refinement — the METIS_PartGraph role used by the reference's
    ClusterData, ``data/cluster.py:28-60``).  Lower edge cut than
    :func:`bfs_partition` at the same balance.

    ``vweights`` (optional, int per node — e.g. degrees) balances per-part
    WEIGHT instead of node count: the edge-balanced mode skew-degree
    graphs need (hub receivers otherwise put almost all edges on one
    part)."""
    s, r = _as_i32(senders), _as_i32(receivers)
    out = np.empty(num_nodes, np.int32)
    if vweights is None:
        rc = _load().stm_ml_partition(
            num_nodes, len(s), _ptr(s), _ptr(r), parts, _ptr(out))
    else:
        w = _as_i32(vweights)
        rc = _load().stm_ml_partition_w(
            num_nodes, len(s), _ptr(s), _ptr(r), _ptr(w), parts, _ptr(out))
    if rc != 0:
        raise ValueError("stm_ml_partition failed")
    return out


def label_matrix(
    rows, cols, nrow: int, ncol: int
) -> Tuple[int, dict]:
    """Brute-force ordering label for one matrix: evaluate the fill (lnz) of
    the AᵀA Cholesky under each candidate column ordering and return
    (argmin class, per-method lnz) — the reference's ``all_methods_time``
    labeler (SparseChol_analyze.c:429-613, Brute-force-fill.txt).

    Classes follow the reference CLI encoding (qrtest.c:157-169):
    0=AMD-role MD, 1=COLAMD-role, 2=METIS-role ND, 3=NESDIS-role ND
    (2 and 3 here differ by leaf size — both use the BFS-bisection ND).
    """
    rows, cols = _as_i32(rows), _as_i32(cols)
    # AᵀA pattern (dense-row capped) as the graph being ordered
    s, d = ata_graph(rows, cols, nrow, ncol)

    fills = {}
    perms = {
        0: order(s, d, ncol, METHOD_MIN_DEGREE),
        1: col_order(rows, cols, nrow, ncol),
        2: order(s, d, ncol, METHOD_NESTED_DISSECTION),
        3: order(s, d, ncol, METHOD_NESDIS),
    }
    for k, p in perms.items():
        lnz, _ = symbolic_fill(s, d, ncol, p)
        fills[k] = lnz
    best = min(fills, key=fills.get)
    return best, fills


def col_etree_post(Cp, Ci, m: int, n: int):
    """Column etree of SᵀS + postorder (native).  ``Cp/Ci``: CSC of S."""
    lib = _load()
    Cp = np.ascontiguousarray(Cp, np.int64)
    Ci = _as_i32(Ci)
    parent = np.empty(n, np.int32)
    post = np.empty(n, np.int32)
    rc = lib.stm_col_etree_post(
        m, n, Cp.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), _ptr(Ci),
        _ptr(parent), _ptr(post))
    if rc != 0:
        raise ValueError("stm_col_etree_post failed")
    return parent.astype(np.int64), post.astype(np.int64)


def qr_col_counts(Sp, Si, parent, m: int, n: int) -> np.ndarray:
    """Column counts of R (GNP skeleton counts, AᵀA form) for the
    POSTORDERED S — the cheap per-ordering fill metric (``counts[j] =
    |C_j|``; lnz = counts.sum(), flop proxy = (counts**2).sum())."""
    lib = _load()
    Sp = np.ascontiguousarray(Sp, np.int64)
    Si = _as_i32(Si)
    par = _as_i32(parent)
    counts = np.empty(n, np.int64)
    rc = lib.stm_qr_col_counts(
        m, n, Sp.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), _ptr(Si),
        _ptr(par), counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc != 0:
        raise ValueError("stm_qr_col_counts failed")
    return counts


def qr_fronts(Rp, Rj, parent, m: int, n: int,
              nrelax: int = 4, zrelax: float = 0.25):
    """Supernodal QR front construction (native) on the postordered S.

    Returns (piv_lo, piv_hi, cols_flat, cols_ptr, srows_flat, srows_ptr)
    — same semantics as the pure-Python path in ``sparseqr/symbolic.py``
    (which is the tested oracle for this function)."""
    lib = _load()
    Rp = np.ascontiguousarray(Rp, np.int64)
    Rj = _as_i32(Rj)
    par = _as_i32(parent)
    nf = ctypes.c_int32()
    p_lo = ctypes.POINTER(ctypes.c_int32)()
    p_hi = ctypes.POINTER(ctypes.c_int32)()
    p_cf = ctypes.POINTER(ctypes.c_int32)()
    p_cp = ctypes.POINTER(ctypes.c_int64)()
    p_sf = ctypes.POINTER(ctypes.c_int32)()
    p_sp = ctypes.POINTER(ctypes.c_int64)()
    rc = lib.stm_qr_fronts(
        m, n, Rp.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), _ptr(Rj),
        _ptr(par), nrelax, float(zrelax), ctypes.byref(nf),
        ctypes.byref(p_lo), ctypes.byref(p_hi), ctypes.byref(p_cf),
        ctypes.byref(p_cp), ctypes.byref(p_sf), ctypes.byref(p_sp))
    if rc != 0:
        raise ValueError("stm_qr_fronts failed")
    k = nf.value
    cols_ptr = np.ctypeslib.as_array(p_cp, shape=(k + 1,)).copy()
    srows_ptr = np.ctypeslib.as_array(p_sp, shape=(k + 1,)).copy()
    out = (
        np.ctypeslib.as_array(p_lo, shape=(k,)).copy(),
        np.ctypeslib.as_array(p_hi, shape=(k,)).copy(),
        np.ctypeslib.as_array(p_cf, shape=(max(int(cols_ptr[-1]), 1),)).copy(),
        cols_ptr,
        np.ctypeslib.as_array(p_sf, shape=(max(int(srows_ptr[-1]), 1),)).copy(),
        srows_ptr,
    )
    for p in (p_lo, p_hi, p_cf, p_cp, p_sf, p_sp):
        lib.stm_free(ctypes.cast(p, ctypes.c_void_p))
    return out
