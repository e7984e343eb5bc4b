"""Numeric multifrontal QR — level-batched dense fronts on the MXU.

Capability match: ``qr_factorize`` / ``qr_kernel``
(``STMMQR/src/qr/SparseQR_factorize.c:222,791-985``).  The reference's hot
loop walks the frontal tree with a NUMA thread pool, assembling each front
(scatter of S rows + child contribution blocks) and factorizing it with
blocked LAPACK Householder kernels.  The TPU redesign exploits a structural
fact of multifrontal *QR* (unlike Cholesky): assembly is pure **row
stacking** — every front row comes from exactly one source (an original S
row or one child-CB row), there are no extend-add collisions.  So:

* the symbolic phase emits, per etree level and per padded shape bucket,
  *static* gather/scatter index arrays;
* the numeric phase is, per bucket, one fused ``gather → batched geqrf →
  scatter`` step under ``jit`` — the batched Householder QR runs on the
  MXU, and XLA overlaps the index traffic with compute;
* all contribution blocks live inside a single flat ``pool`` array (each
  front owns an ``fn×fn`` R_F slot), the TPU analog of the reference's
  per-task NUMA stacks (``SparseQR_factorize.c:405-425``).

A NumPy float64 per-front oracle (`factorize_numpy`) doubles as the
correctness reference and the serial fallback (the role of the reference's
OOM fallback, ``SparseQR_factorize.c:432-468``).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from .symbolic import ORDER_COLAMD, SymbolicQR, analyze


def _pad_dim(x: int) -> int:
    """Round a front dimension up to an MXU/VPU-friendly size class."""
    for s in (8, 16, 32, 64, 128):
        if x <= s:
            return s
    return ((x + 127) // 128) * 128


def _pad_len(x: int) -> int:
    """Round an index-array length to the next power of two (compile-cache
    friendliness: OOB-drop scatter / clamped gather make padding free)."""
    if x <= 8:
        return 8
    return 1 << (x - 1).bit_length()


@dataclass
class Bucket:
    """All fronts of one etree level sharing a padded shape."""
    fids: List[int]
    fm_pad: int
    fn_pad: int
    # assembly: S entries (gather from row-major CSR data of S)
    s_gather: np.ndarray = field(default=None)   # into St.data
    s_scatter: np.ndarray = field(default=None)  # into (B*fm_pad*fn_pad,)
    # assembly: child contribution blocks (gather from the R_F pool)
    cb_gather: np.ndarray = field(default=None)
    cb_scatter: np.ndarray = field(default=None)
    # extraction: R_F upper triangle → pool
    rf_gather: np.ndarray = field(default=None)  # into (B*fm_pad*fn_pad,)
    rf_scatter: np.ndarray = field(default=None)  # into pool

    @property
    def batch(self) -> int:
        return len(self.fids)


@dataclass
class QRPlan:
    sym: SymbolicQR
    St: sp.csr_matrix                 # row-major S (values gathered from .data)
    buckets: List[List[Bucket]]       # per level
    diag_idx: np.ndarray              # pool indices of R's diagonal (n,)
    maxcolnorm: float


def build_plan(sym: SymbolicQR, S: sp.csc_matrix) -> QRPlan:
    St = S.tocsr()
    St.sum_duplicates()
    Rp, Rj = St.indptr, St.indices
    fronts = sym.fronts
    idx_t = np.int64 if sym.pool_size > 2**31 - 2 else np.int32

    buckets: List[List[Bucket]] = []
    for level_fids in sym.levels:
        groups: Dict[Tuple[int, int], Bucket] = {}
        for fid in level_fids:
            f = fronts[fid]
            key = (_pad_dim(max(f.fm, f.fn)), _pad_dim(f.fn))
            groups.setdefault(key, Bucket([], *key)).fids.append(fid)
        level_buckets = []
        for bucket in groups.values():
            fm_pad, fn_pad = bucket.fm_pad, bucket.fn_pad
            fsz = fm_pad * fn_pad
            s_g, s_s, cb_g, cb_s, rf_g, rf_s = [], [], [], [], [], []
            for b, fid in enumerate(bucket.fids):
                f = fronts[fid]
                base = b * fsz
                # --- original S rows (stacked first) --------------------
                for lr, i in enumerate(f.srows):
                    lo, hi = Rp[i], Rp[i + 1]
                    lc = np.searchsorted(f.cols, Rj[lo:hi])
                    s_g.append(np.arange(lo, hi, dtype=np.int64))
                    s_s.append(base + lr * fn_pad + lc)
                # --- children contribution blocks -----------------------
                row0 = len(f.srows)
                for cid in f.children:
                    c = fronts[cid]
                    if c.cb_rows > 0:
                        w = c.fn - c.npiv
                        lc = np.searchsorted(f.cols, c.cols[c.npiv:])
                        rr = np.arange(c.cb_rows, dtype=np.int64)
                        src = (c.pool_off
                               + (c.npiv + rr)[:, None] * c.fn
                               + (c.npiv + np.arange(w, dtype=np.int64))[None, :])
                        dst = base + (row0 + rr)[:, None] * fn_pad + lc[None, :]
                        cb_g.append(src.ravel())
                        cb_s.append(dst.ravel())
                    row0 += c.cb_rows
                # --- R_F upper triangle extraction -----------------------
                r, cmat = np.meshgrid(np.arange(f.fn, dtype=np.int64),
                                      np.arange(f.fn, dtype=np.int64),
                                      indexing="ij")
                ut = cmat >= r
                rf_g.append(base + r[ut] * fn_pad + cmat[ut])
                rf_s.append(f.pool_off + (r[ut] * f.fn + cmat[ut]))

            def _cat_pad(chunks, oob):
                a = (np.concatenate(chunks) if chunks
                     else np.zeros(0, np.int64))
                pad = _pad_len(len(a)) - len(a)
                return np.concatenate([a, np.full(pad, oob, np.int64)])

            buf_size = bucket.batch * fsz
            sg = _cat_pad(s_g, 0)
            ss = _cat_pad(s_s, buf_size)          # OOB scatter → dropped
            cg = _cat_pad(cb_g, 0)
            cs = _cat_pad(cb_s, buf_size)
            rg = _cat_pad(rf_g, 0)
            rs = _cat_pad(rf_s, sym.pool_size)
            bucket.s_gather = sg.astype(np.int64)
            bucket.s_scatter = ss.astype(np.int64)
            bucket.cb_gather = cg.astype(idx_t)
            bucket.cb_scatter = cs.astype(np.int64)
            bucket.rf_gather = rg.astype(np.int64)
            bucket.rf_scatter = rs.astype(idx_t)
            level_buckets.append(bucket)
        buckets.append(level_buckets)

    diag_idx = np.zeros(sym.n, idx_t)
    for f in fronts:
        t = np.arange(f.npiv, dtype=np.int64)
        diag_idx[f.pivots] = f.pool_off + t * f.fn + t

    colnorms = np.sqrt(np.asarray(
        S.multiply(S).sum(axis=0)).ravel()) if S.nnz else np.zeros(1)
    return QRPlan(sym=sym, St=St, buckets=buckets, diag_idx=diag_idx,
                  maxcolnorm=float(colnorms.max(initial=0.0)))


def default_tol(m: int, n: int, maxcolnorm: float,
                dtype=np.float32) -> float:
    """Reference rank-detection tolerance: ``tol = 20(m+n)·eps·max‖A_j‖₂``
    (``qrtest.c:135-142`` / ``SparseQR.c:1402``).

    The reference always computes in float64, so ``eps`` there is eps₆₄.
    For the f32 MXU path we keep the reference formula (eps₆₄) with a
    float32-roundoff floor instead of scaling the whole formula by eps₃₂ —
    ``20(m+n)·eps₃₂`` would mark legitimate pivots dead for n ≳ 10³
    (observed on epb1: 234 live columns killed)."""
    eps64 = float(np.finfo(np.float64).eps)
    tol = 20.0 * (m + n) * eps64
    if np.dtype(dtype) == np.float32:
        tol = max(tol, 128.0 * float(np.finfo(np.float32).eps))
    return tol * maxcolnorm


@dataclass
class QRFactorization:
    """Numeric factorization handle (the reference's ``QRnum`` role)."""
    sym: SymbolicQR
    plan: QRPlan
    pool: object                     # flat R_F storage (jnp or np)
    tol: float
    rank: int
    diag: np.ndarray
    backend: str                     # "jax" | "numpy"
    q_data: Optional[List[List[Tuple]]] = None  # per level/bucket (fact, taus)
    dtype: object = np.float32

    @property
    def keep_q(self) -> bool:
        return self.q_data is not None

    def pool_np(self) -> np.ndarray:
        return np.asarray(self.pool)

    def R_csr(self) -> sp.csr_matrix:
        """Global R (n×n, upper triangular, postordered column labels):
        A[:, sym.q] = Q · R."""
        pool = self.pool_np()
        rows, cols, vals = [], [], []
        for f in self.sym.fronts:
            for t in range(f.npiv):
                width = f.fn - t
                rows.append(np.full(width, f.pivots[t], np.int64))
                cols.append(f.cols[t:])
                off = f.pool_off + t * f.fn + t
                vals.append(pool[off:off + width])
        n = self.sym.n
        if not rows:
            return sp.csr_matrix((n, n))
        R = sp.csr_matrix(
            (np.concatenate(vals).astype(np.float64),
             (np.concatenate(rows), np.concatenate(cols))), shape=(n, n))
        R.sum_duplicates()
        return R


def factorize_numpy(A: sp.spmatrix, sym: Optional[SymbolicQR] = None,
                    ordering: int = ORDER_COLAMD,
                    tol: Optional[float] = None) -> QRFactorization:
    """Serial float64 per-front oracle (reference role: the serial fallback
    path, ``SparseQR_factorize.c:432-468``; also the parity oracle for the
    batched device path)."""
    A = sp.csc_matrix(A).astype(np.float64)
    if sym is None:
        sym = analyze(A, ordering)
    S = A[:, sym.q].tocsc()
    plan = build_plan(sym, S)
    St = plan.St
    pool = np.zeros(sym.pool_size, np.float64)
    for f in sym.fronts:  # ascending fid = postorder (children first)
        fm_eff = max(f.fm, f.fn)
        F = np.zeros((fm_eff, f.fn))
        for lr, i in enumerate(f.srows):
            lo, hi = St.indptr[i], St.indptr[i + 1]
            lc = np.searchsorted(f.cols, St.indices[lo:hi])
            F[lr, lc] = St.data[lo:hi]
        row0 = len(f.srows)
        for cid in f.children:
            c = sym.fronts[cid]
            if c.cb_rows > 0:
                cRf = pool[c.pool_off:c.pool_off + c.fn * c.fn].reshape(
                    c.fn, c.fn)
                lc = np.searchsorted(f.cols, c.cols[c.npiv:])
                F[row0:row0 + c.cb_rows, lc] = cRf[
                    c.npiv:c.npiv + c.cb_rows, c.npiv:]
            row0 += c.cb_rows
        Rf = np.linalg.qr(F, mode="r")  # (fn, fn) since fm_eff ≥ fn
        pool[f.pool_off:f.pool_off + f.fn * f.fn] = np.triu(Rf).ravel()
    diag = pool[np.asarray(plan.diag_idx, np.int64)]
    t = default_tol(sym.m, sym.n, plan.maxcolnorm, np.float64) \
        if tol is None else tol
    return QRFactorization(sym=sym, plan=plan, pool=pool, tol=t,
                           rank=int((np.abs(diag) > t).sum()), diag=diag,
                           backend="numpy", dtype=np.float64)


# Private fast path: geqrf gives R without materializing Q (XLA lowers it
# to the blocked Householder kernel either way).  Public fallback: full QR.
try:  # pragma: no cover - availability depends on the JAX build
    from jax._src.lax.linalg import geqrf as _geqrf
except Exception:  # pragma: no cover
    _geqrf = None


def _assemble(batch, fm_pad, fn_pad, pool, sdata, s_g, s_s, cb_g, cb_s):
    """Front assembly = pure row stacking: scatter S entries and child-CB
    entries into the padded bucket buffer.  OOB semantics do the padding
    work (scatter index == size → dropped)."""
    fsz = batch * fm_pad * fn_pad
    buf = jnp.zeros(fsz, pool.dtype)
    buf = buf.at[s_s].set(sdata[s_g], mode="drop")
    buf = buf.at[cb_s].set(pool[cb_g], mode="drop")
    return buf.reshape(batch, fm_pad, fn_pad)


def _pack_r(pool, Rflat, fm_pad, fn_pad, rf_g, rf_s):
    """Scatter the upper triangle of each front's R into its pool slot.
    ``rf_g`` encodes (b, r, c) in full-buffer layout; mask the strict lower
    part (the geqrf path stores Householder vectors there)."""
    rvals = Rflat[rf_g]
    rmask = (rf_g % (fm_pad * fn_pad)) // fn_pad <= (rf_g % fn_pad)
    return pool.at[rf_s].set(jnp.where(rmask, rvals, 0), mode="drop")


@partial(jax.jit, static_argnums=(0, 1, 2), donate_argnums=(3,))
def _bucket_step_r(batch: int, fm_pad: int, fn_pad: int,
                   pool, sdata, s_g, s_s, cb_g, cb_s, rf_g, rf_s):
    """R-only level-bucket: assemble → batched Householder QR → pack R_F."""
    F = _assemble(batch, fm_pad, fn_pad, pool, sdata, s_g, s_s, cb_g, cb_s)
    if _geqrf is not None:
        fact, _ = _geqrf(F)
    else:
        _, fact = jax.lax.linalg.qr(F, full_matrices=True)
    return _pack_r(pool, fact.reshape(-1), fm_pad, fn_pad, rf_g, rf_s)


@partial(jax.jit, static_argnums=(0, 1, 2), donate_argnums=(3,))
def _bucket_step_q(batch: int, fm_pad: int, fn_pad: int,
                   pool, sdata, s_g, s_s, cb_g, cb_s, rf_g, rf_s):
    """keep_q variant: also materializes each front's full orthogonal Q
    (fm_pad×fm_pad) so ``qmult`` is batched MXU matmuls."""
    F = _assemble(batch, fm_pad, fn_pad, pool, sdata, s_g, s_s, cb_g, cb_s)
    Q, R = jax.lax.linalg.qr(F, full_matrices=True)
    pool = _pack_r(pool, R.reshape(-1), fm_pad, fn_pad, rf_g, rf_s)
    return pool, Q


def factorize(A: sp.spmatrix, sym: Optional[SymbolicQR] = None,
              ordering: int = ORDER_COLAMD, tol: Optional[float] = None,
              keep_q: bool = False, dtype=jnp.float32) -> QRFactorization:
    """Level-batched multifrontal QR on the default JAX backend.

    ``keep_q=True`` retains each bucket's batched per-front orthogonal
    factors so :func:`~.solve.qmult` can apply Q/Qᵀ — the reference keeps
    the equivalent Householder blocks in ``QRnum`` for ``QR_qmult``
    (``SparseQR.c:1838``)."""
    A = sp.csc_matrix(A)
    if sym is None:
        sym = analyze(A, ordering)
    S = A[:, sym.q].tocsc()
    plan = build_plan(sym, S)
    pool = jnp.zeros(sym.pool_size, dtype)
    sdata = jnp.asarray(plan.St.data, dtype)
    q_data: Optional[List[List[Tuple]]] = [] if keep_q else None
    for level_buckets in plan.buckets:
        level_q = []
        for bk in level_buckets:
            args = (bk.batch, bk.fm_pad, bk.fn_pad, pool, sdata,
                    jnp.asarray(bk.s_gather), jnp.asarray(bk.s_scatter),
                    jnp.asarray(bk.cb_gather), jnp.asarray(bk.cb_scatter),
                    jnp.asarray(bk.rf_gather), jnp.asarray(bk.rf_scatter))
            if keep_q:
                pool, Q = _bucket_step_q(*args)
                level_q.append(Q)
            else:
                pool = _bucket_step_r(*args)
        if keep_q:
            q_data.append(level_q)
    diag = np.asarray(pool)[np.asarray(plan.diag_idx, np.int64)]
    t = default_tol(sym.m, sym.n, plan.maxcolnorm,
                    np.dtype(dtype)) if tol is None else tol
    return QRFactorization(sym=sym, plan=plan, pool=pool, tol=t,
                           rank=int((np.abs(diag) > t).sum()), diag=diag,
                           backend="jax", q_data=q_data, dtype=dtype)
