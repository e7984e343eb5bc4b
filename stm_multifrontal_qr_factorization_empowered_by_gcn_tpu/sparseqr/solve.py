"""Solve layer for the multifrontal QR: Q application and R solves.

Capability match:

* :func:`qmult` — ``QR_qmult`` (``STMMQR/src/qr/SparseQR.c:1838``):
  apply Qᵀ or Q by replaying the per-front Householder reflectors in
  tree (level) order.  Reference applies H blocks with LAPACK; here each
  level bucket applies its reflectors as one batched rank-1-update loop
  under ``jit`` (``lax.fori_loop`` over the static reflector count).
* :func:`rsolve` — ``QR_solve``/``qr_rsolve`` (``SparseQR.c:2118,2218``):
  sparse-R triangular solve, level-batched: each front contributes one
  dense ``npiv×npiv`` triangular solve plus a ``npiv×(fn−npiv)`` MXU
  matmul against already-solved ancestor entries.  Dead columns
  (|diag| ≤ tol) yield x=0, mirroring the reference's ``Rdead`` handling
  (``SparseQR_factorize.c:1383-`` rank detection).
* :func:`least_squares` / :func:`lq_min_norm_solve` — the ``qrtest``
  solve-and-check flow (``test/qrtest.c:11-53``) and ``SparseLQ``
  (``SparseLQ.c:691``) roles.

Index-array padding convention: every vector gets one trailing dummy row
and every padded index points at it, so padded lanes gather zeros and
scatter harmlessly into the dummy row — static shapes, no OOB semantics.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Tuple

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from jax import lax

from .numeric import QRFactorization, _pad_dim, _pad_len, factorize
from .symbolic import SymbolicQR


# --------------------------------------------------------------------------
# R solve
# --------------------------------------------------------------------------

@dataclass
class _RSolveBucket:
    t_idx: np.ndarray      # (B, npiv_pad, npiv_pad) pool idx of T, −1 = zero
    rpa_idx: np.ndarray    # (B, npiv_pad, w_pad)    pool idx of R_PA
    anc: np.ndarray        # (B, w_pad)    x-slot of ancestor cols (pad → n)
    piv: np.ndarray        # (B, npiv_pad) x-slot of pivot cols    (pad → n)


def _build_rsolve_plan(sym: SymbolicQR) -> List[List[_RSolveBucket]]:
    n = sym.n
    levels: List[List[_RSolveBucket]] = []
    for level_fids in sym.levels:
        groups: Dict[Tuple[int, int], List[int]] = {}
        for fid in level_fids:
            f = sym.fronts[fid]
            key = (_pad_dim(f.npiv), _pad_dim(f.fn - f.npiv))
            groups.setdefault(key, []).append(fid)
        buckets = []
        for (npp, wp), fids in groups.items():
            B = len(fids)
            t_idx = np.full((B, npp, npp), -1, np.int64)
            rpa_idx = np.full((B, npp, wp), -1, np.int64)
            anc = np.full((B, wp), n, np.int64)
            piv = np.full((B, npp), n, np.int64)
            for b, fid in enumerate(fids):
                f = sym.fronts[fid]
                w = f.fn - f.npiv
                r = np.arange(f.npiv)
                for t in r:
                    t_idx[b, t, t:f.npiv] = (
                        f.pool_off + t * f.fn_stride + np.arange(t, f.npiv))
                rpa_idx[b, :f.npiv, :w] = (
                    f.pool_off + r[:, None] * f.fn_stride
                    + (f.npiv + np.arange(w))[None, :])
                anc[b, :w] = f.cols[f.npiv:]
                piv[b, :f.npiv] = f.pivots
            buckets.append(_RSolveBucket(t_idx, rpa_idx, anc, piv))
        levels.append(buckets)
    return levels


def _rsolve_plan(F: QRFactorization) -> List[List[_RSolveBucket]]:
    cache = getattr(F.plan, "_rsolve_plan", None)
    if cache is None:
        cache = _build_rsolve_plan(F.sym)
        F.plan._rsolve_plan = cache
    return cache


def _gather_blocks(pool, t_idx, rpa_idx, tol):
    T = jnp.where(t_idx >= 0, pool[jnp.maximum(t_idx, 0)], 0.0)
    Rpa = jnp.where(rpa_idx >= 0, pool[jnp.maximum(rpa_idx, 0)], 0.0)
    d = jnp.diagonal(T, axis1=1, axis2=2)
    live = jnp.abs(d) > tol                       # dead or padded → False
    npp = T.shape[1]
    eye = jnp.eye(npp, dtype=pool.dtype)
    T_eff = jnp.where(live[:, :, None], T, 0.0) \
        + eye[None] * (~live)[:, :, None]
    return T_eff, Rpa, live


def _rsolve_body(pool, x, c, t_idx, rpa_idx, anc, piv, tol):
    """x[piv] = T⁻¹ (c[piv] − R_PA · x[anc]) for one reverse-level bucket."""
    T_eff, Rpa, live = _gather_blocks(pool, t_idx, rpa_idx, tol)
    rhs = (c[piv] - Rpa @ x[anc]) * live[..., None]
    sol = jax.scipy.linalg.solve_triangular(T_eff, rhs, lower=False)
    return x.at[piv].set(sol)


def _rtsolve_body(pool, x, c, t_idx, rpa_idx, anc, piv, tol):
    """Forward (Rᵀ) variant: y[piv] = T⁻ᵀ c[piv]; push −R_PAᵀ y to ancestors."""
    T_eff, Rpa, live = _gather_blocks(pool, t_idx, rpa_idx, tol)
    rhs = c[piv] * live[..., None]
    sol = jax.scipy.linalg.solve_triangular(
        T_eff, rhs, lower=False, trans=1)
    c = c.at[anc].add(-jnp.swapaxes(Rpa, 1, 2) @ sol)
    return x.at[piv].set(sol), c


def _make_rsolve_run(plan: List[List[_RSolveBucket]], trans: bool):
    """Whole backsolve as ONE jitted program (single dispatch under the
    tunnel); index arrays ride as arguments, like the factorize run."""
    order = plan if trans else list(reversed(plan))
    arrays = tuple(tuple((jnp.asarray(bk.t_idx), jnp.asarray(bk.rpa_idx),
                          jnp.asarray(bk.anc), jnp.asarray(bk.piv))
                         for bk in level) for level in order)

    @jax.jit
    def _run(pool, cp, tol, arrs):
        x = jnp.zeros_like(cp)
        for level in arrs:
            for (t_idx, rpa_idx, anc, piv) in level:
                if trans:
                    x, cp = _rtsolve_body(pool, x, cp, t_idx, rpa_idx,
                                          anc, piv, tol)
                else:
                    x = _rsolve_body(pool, x, cp, t_idx, rpa_idx,
                                     anc, piv, tol)
        return x

    return lambda pool, cp, tol: _run(pool, cp, tol, arrays)


def rsolve(F: QRFactorization, c, trans: bool = False) -> jnp.ndarray:
    """Solve ``R x = c`` (or ``Rᵀ x = c`` with ``trans=True``) where both
    vectors are indexed by *postordered* columns.  ``c``: (n,) or (n, k).
    Dead columns (rank deficiency) yield 0, as in the reference's
    R1-skipping solve (``SparseQR.c:2118``)."""
    c = jnp.asarray(c, F.pool.dtype if hasattr(F.pool, "dtype")
                    else np.float64)
    squeeze = c.ndim == 1
    if squeeze:
        c = c[:, None]
    pool = jnp.asarray(F.pool)
    cp = jnp.concatenate([c, jnp.zeros((1, c.shape[1]), c.dtype)])
    plan = _rsolve_plan(F)
    cache = getattr(F.plan, "_rsolve_runs", None) or {}
    run = cache.get(trans)
    if run is None:
        run = _make_rsolve_run(plan, trans)
        cache[trans] = run
        F.plan._rsolve_runs = cache
    x = run(pool, cp, jnp.asarray(F.tol, cp.dtype))[:-1]
    return x[:, 0] if squeeze else x


# --------------------------------------------------------------------------
# Q application
# --------------------------------------------------------------------------

@dataclass
class _QBucket:
    batch: int
    fm_pad: int
    fn_pad: int
    src_x_pos: np.ndarray   # v-flat rows fed from X (original A rows)
    src_x_ids: np.ndarray
    src_c_pos: np.ndarray   # v-flat rows fed from the carry pool
    src_c_idx: np.ndarray
    out_p_pos: np.ndarray   # v-flat pivot rows → out[pivot slot]
    out_p_slot: np.ndarray
    out_c_pos: np.ndarray   # v-flat CB rows → carry pool
    out_c_idx: np.ndarray
    out_e_pos: np.ndarray   # v-flat extra rows → out[n + extra slot]
    out_e_slot: np.ndarray


@dataclass
class _QPlan:
    buckets: List[List[_QBucket]]
    n_q: int                 # qmult vector length
    total_carry: int
    empty_ids: np.ndarray    # A rows with no nonzeros (identity part of Q)
    empty_slots: np.ndarray


def _build_q_plan(F: QRFactorization) -> _QPlan:
    sym, plan = F.sym, F.plan
    fronts = sym.fronts
    carry_off = np.zeros(len(fronts) + 1, np.int64)
    extra_off = np.zeros(len(fronts) + 1, np.int64)
    for f in fronts:
        carry_off[f.fid + 1] = f.cb_rows
        extra_off[f.fid + 1] = max(0, f.fm - f.npiv - f.cb_rows)
    carry_off = np.cumsum(carry_off)
    extra_off = np.cumsum(extra_off)
    total_carry = int(carry_off[-1])
    total_extra = int(extra_off[-1])

    row_nnz = np.diff(plan.St.indptr)
    empty_ids = np.nonzero(row_nnz == 0)[0]
    n_q = sym.n + total_extra + len(empty_ids)
    empty_slots = sym.n + total_extra + np.arange(len(empty_ids))

    levels: List[List[_QBucket]] = []
    for level_buckets in plan.buckets:
        out_level = []
        for bk in level_buckets:
            fm_pad, fn_pad, B = bk.fm_pad, bk.fn_pad, bk.batch
            sxp, sxi, scp, sci = [], [], [], []
            opp, ops, ocp, oci, oep, oes = [], [], [], [], [], []
            for b, fid in enumerate(bk.fids):
                f = fronts[fid]
                base = b * fm_pad
                ns = len(f.srows)
                sxp.append(base + np.arange(ns))
                sxi.append(f.srows)
                row0 = ns
                for cid in f.children:
                    c = fronts[cid]
                    if c.cb_rows:
                        scp.append(base + row0 + np.arange(c.cb_rows))
                        sci.append(carry_off[cid] + np.arange(c.cb_rows))
                    row0 += c.cb_rows
                opp.append(base + np.arange(f.npiv))
                ops.append(f.pivots)
                if f.cb_rows:
                    ocp.append(base + f.npiv + np.arange(f.cb_rows))
                    oci.append(carry_off[fid] + np.arange(f.cb_rows))
                ne = max(0, f.fm - f.npiv - f.cb_rows)
                if ne:
                    oep.append(base + f.npiv + f.cb_rows + np.arange(ne))
                    oes.append(sym.n + extra_off[fid] + np.arange(ne))

            def _pair(pos, idx, pos_oob, idx_oob):
                p = (np.concatenate(pos) if pos else np.zeros(0, np.int64))
                i = (np.concatenate(idx) if idx else np.zeros(0, np.int64))
                pad = _pad_len(len(p)) - len(p)
                p = np.concatenate([p, np.full(pad, pos_oob, np.int64)])
                i = np.concatenate([i, np.full(pad, idx_oob, np.int64)])
                return p, i

            vn = B * fm_pad
            a, b_ = _pair(sxp, sxi, vn, sym.m)
            c_, d = _pair(scp, sci, vn, total_carry)
            e, g = _pair(opp, ops, vn, n_q)
            h, i_ = _pair(ocp, oci, vn, total_carry)
            j, k = _pair(oep, oes, vn, n_q)
            out_level.append(_QBucket(B, fm_pad, fn_pad, a, b_, c_, d,
                                      e, g, h, i_, j, k))
        levels.append(out_level)
    return _QPlan(levels, n_q, total_carry, empty_ids, empty_slots)


def _q_plan(F: QRFactorization) -> _QPlan:
    cache = getattr(F.plan, "_q_plan", None)
    if cache is None:
        cache = _build_q_plan(F)
        F.plan._q_plan = cache
    return cache


def _qtx_bucket(Xp, out, carry, Q,
                src_x_pos, src_x_ids, src_c_pos, src_c_idx,
                out_p_pos, out_p_slot, out_c_pos, out_c_idx,
                out_e_pos, out_e_slot):
    """One level bucket of Qᵀ·x: gather front rows, one batched MXU matmul
    against the stored per-front orthogonal factors, scatter outputs."""
    B, fm_pad, _ = Q.shape
    k = Xp.shape[1]
    v = jnp.zeros((B * fm_pad + 1, k), Xp.dtype)
    v = v.at[src_x_pos].set(Xp[src_x_ids])
    v = v.at[src_c_pos].set(carry[src_c_idx])
    v = jnp.einsum("bmn,bmk->bnk", Q, v[:-1].reshape(B, fm_pad, k),
                   preferred_element_type=Xp.dtype)
    v = jnp.concatenate([v.reshape(B * fm_pad, k),
                         jnp.zeros((1, k), Xp.dtype)])
    out = out.at[out_p_slot].set(v[out_p_pos])
    carry = carry.at[out_c_idx].set(v[out_c_pos])
    out = out.at[out_e_slot].set(v[out_e_pos])
    return out, carry


def _qx_bucket(Yp, xout, carry, Q,
               src_x_pos, src_x_ids, src_c_pos, src_c_idx,
               out_p_pos, out_p_slot, out_c_pos, out_c_idx,
               out_e_pos, out_e_slot):
    B, fm_pad, _ = Q.shape
    k = Yp.shape[1]
    v = jnp.zeros((B * fm_pad + 1, k), Yp.dtype)
    v = v.at[out_p_pos].set(Yp[out_p_slot])
    v = v.at[out_c_pos].set(carry[out_c_idx])
    v = v.at[out_e_pos].set(Yp[out_e_slot])
    v = jnp.einsum("bmn,bnk->bmk", Q, v[:-1].reshape(B, fm_pad, k),
                   preferred_element_type=Yp.dtype)
    v = jnp.concatenate([v.reshape(B * fm_pad, k),
                         jnp.zeros((1, k), Yp.dtype)])
    xout = xout.at[src_x_ids].set(v[src_x_pos])
    carry = carry.at[src_c_idx].set(v[src_c_pos])
    return xout, carry


def _qbucket_arrays(bk: _QBucket):
    return tuple(jnp.asarray(a) for a in (
        bk.src_x_pos, bk.src_x_ids, bk.src_c_pos, bk.src_c_idx,
        bk.out_p_pos, bk.out_p_slot, bk.out_c_pos, bk.out_c_idx,
        bk.out_e_pos, bk.out_e_slot))


def _make_q_run(qp: _QPlan, kind: str, m: int):
    """Whole Q application fused into one jitted program; index arrays and
    the stored Q factors ride as arguments."""
    idx = tuple(tuple(_qbucket_arrays(bk) for bk in level)
                for level in qp.buckets)
    empty_ids = jnp.asarray(qp.empty_ids)
    empty_slots = jnp.asarray(qp.empty_slots)
    has_empty = len(qp.empty_ids) > 0

    @jax.jit
    def _run_qtx(Xp, qdata, arrs):
        k = Xp.shape[1]
        carry = jnp.zeros((qp.total_carry + 1, k), Xp.dtype)
        out = jnp.zeros((qp.n_q + 1, k), Xp.dtype)
        if has_empty:
            out = out.at[empty_slots].set(Xp[empty_ids])
        for level_arr, q_level in zip(arrs, qdata):
            for ba, Q in zip(level_arr, q_level):
                out, carry = _qtx_bucket(Xp, out, carry, Q, *ba)
        return out

    @jax.jit
    def _run_qx(Yp, qdata, arrs):
        k = Yp.shape[1]
        carry = jnp.zeros((qp.total_carry + 1, k), Yp.dtype)
        xout = jnp.zeros((m + 1, k), Yp.dtype)
        if has_empty:
            xout = xout.at[empty_ids].set(Yp[empty_slots])
        for level_arr, q_level in zip(reversed(arrs), reversed(qdata)):
            for ba, Q in zip(level_arr, q_level):
                xout, carry = _qx_bucket(Yp, xout, carry, Q, *ba)
        return xout

    run = _run_qtx if kind == "QTX" else _run_qx
    return lambda Xp, qdata: run(Xp, tuple(map(tuple, qdata)), idx)


def qmult(F: QRFactorization, X, kind: str = "QTX") -> jnp.ndarray:
    """Apply the implicit orthogonal factor (``QR_qmult`` role).

    ``kind="QTX"`` maps A-row space (m) → factorization row space
    (``n_q = n + extras``); ``kind="QX"`` maps back.  ``X``: (m,) / (m, k)
    for QTX, (n_q,) / (n_q, k) for QX.  Requires ``factorize(keep_q=True)``.
    """
    if not F.keep_q:
        raise ValueError("qmult requires factorize(..., keep_q=True)")
    if kind not in ("QTX", "QX"):
        raise ValueError("kind must be 'QTX' or 'QX'")
    qp = _q_plan(F)
    X = jnp.asarray(X)
    squeeze = X.ndim == 1
    if squeeze:
        X = X[:, None]
    Xp = jnp.concatenate([X, jnp.zeros((1, X.shape[1]), X.dtype)])
    cache = getattr(F.plan, "_q_runs", None) or {}
    run = cache.get(kind)
    if run is None:
        run = _make_q_run(qp, kind, F.sym.m)
        cache[kind] = run
        F.plan._q_runs = cache
    out = run(Xp, F.q_data)[:-1]
    return out[:, 0] if squeeze else out


# --------------------------------------------------------------------------
# Drivers
# --------------------------------------------------------------------------

def _qr_solve_once(F: QRFactorization, b) -> np.ndarray:
    y = qmult(F, b, "QTX")
    x_post = np.asarray(rsolve(F, y[:F.sym.n]))
    out = np.empty_like(x_post)
    out[F.sym.q] = x_post
    return out


def _seminormal_solve_once(F: QRFactorization, A64: sp.csc_matrix,
                           b) -> np.ndarray:
    """Q-less solve via the (corrected) seminormal equations:
    RᵀR x = Aᵀb.  Needs only R — no stored Q — so it is the memory-light
    path for large problems (same trade SuiteSparseQR makes; pair with
    ``refine`` for backward stability)."""
    b64 = np.asarray(b, np.float64)
    atb = (A64.T @ b64)[np.asarray(F.sym.q)]
    y = rsolve(F, jnp.asarray(atb, np.float32
                              if np.dtype(F.dtype) == np.float32
                              else np.float64), trans=True)
    x_post = np.asarray(rsolve(F, y))
    out = np.empty_like(x_post)
    out[F.sym.q] = x_post
    return out


def _pow2_equilibrate(A: sp.csc_matrix) -> Tuple[np.ndarray, np.ndarray]:
    """Power-of-2 row/column scalings (exact in floating point).

    Rows are scaled only for SQUARE systems — row scaling reweights a
    rectangular least-squares objective, but for m == n the solve is exact
    and ``Dr A Dc z = Dr b`` recovers the original solution unchanged.
    Column scaling (a change of variable units) is always safe."""
    m, n = A.shape
    Aa = abs(A.tocsr(copy=True))
    dr = np.ones(m)
    if m == n:
        rmax = np.asarray(Aa.max(axis=1).todense()).ravel()
        dr = np.exp2(-np.round(np.log2(np.where(rmax > 0, rmax, 1.0))))
        Aa = sp.diags(dr) @ Aa
    cmax = np.asarray(Aa.max(axis=0).todense()).ravel()
    dc = np.exp2(-np.round(np.log2(np.where(cmax > 0, cmax, 1.0))))
    return dr, dc


def least_squares(A: sp.spmatrix, b, F: Optional[QRFactorization] = None,
                  refine: int = 0, method: str = "qmult",
                  damp: Optional[float] = None,
                  equilibrate: bool = False,
                  **fact_kw) -> Tuple[jnp.ndarray, QRFactorization]:
    """min ‖A x − b‖₂ — the ``qrtest`` solve flow
    (``test/qrtest.c:11-53``: ``QR_qmult(QTX)`` + ``QR_solve(RETX)``).

    ``method="qmult"`` applies the stored Q (requires
    ``factorize(keep_q=True)``); ``method="seminormal"`` solves
    RᵀR x = Aᵀb from a Q-less factorization — much lighter in memory, and
    with ``refine ≥ 1`` equally accurate (corrected seminormal equations).

    **Rank deficiency** (``F.rank < n``, incl. numerical deficiency at the
    working precision): the level-batched MXU path factorizes fronts with
    *unpivoted* blocked Householder QR, so a dead pivot's R row still
    carries O(‖A‖) mass to its right and the basic ``x[dead]=0`` backsolve
    would discard that constraint (unlike the reference's staircase,
    ``SparseQR_factorize.c:1383-``, which never advances past a dead
    pivot).  Instead of a data-dependent staircase — hostile to static
    shapes — the solver switches to the **damped (Tikhonov) augmented
    system** ``[A; λI] x = [b; 0]`` with ``λ = damp or F.tol``: full column
    rank by construction, every existing kernel reused, and the solution
    is the ridge-regularized least-squares answer (residual bias O(λ²/σ²)
    on the live spectrum).  Pass ``damp=0.0`` to force the raw basic
    solution.

    ``refine`` > 0 adds iterative-refinement passes with the residual
    accumulated in float64 on host: the TPU-native answer to the
    reference's float64 fronts — the f32 MXU factorization is reused as a
    preconditioner-exact solver and each pass multiplies the accuracy by
    ~κ·eps₃₂ until it hits the f64 floor."""
    A64 = sp.csc_matrix(A).astype(np.float64)
    if equilibrate:
        # Badly scaled systems (circuit matrices span ~1e±10) put the f32
        # factorization's κ·eps32 contraction near 1 and refinement stalls
        # in the 1e-4 band; exact power-of-2 equilibration restores it.
        # The scaled factorization reuses the caller's SYMBOLIC analysis
        # (identical pattern) and is cached on the handle.
        if F is not None and F.scaled is not None:
            dr, dc, A_s64, F_sc = F.scaled
        else:
            dr, dc = _pow2_equilibrate(A64)
            # scale the data array in place: sp.diags(..) @ A @ sp.diags(..)
            # PRUNES explicit zeros, changing the pattern out from under the
            # reused symbolic analysis (IndexError on matrices with stored
            # zeros — bayer10/cvxqp3/ex18)
            A_s64 = A64.copy()
            col_rep = np.repeat(dc, np.diff(A_s64.indptr))
            A_s64.data = A_s64.data * dr[A_s64.indices] * col_rep
            kw = dict(fact_kw)
            if F is not None:
                kw.setdefault("sym", F.sym)
                # value-dependent tol must be recomputed for the scaled
                # values (the cached plan's maxcolnorm is the unscaled one)
                from .numeric import default_tol
                mc = float(np.sqrt(A_s64.multiply(A_s64).sum(axis=0).max()))
                kw.setdefault("tol", default_tol(
                    *A_s64.shape, mc, np.dtype(np.float32)))
            F_sc = factorize(A_s64, keep_q=(method == "qmult"), **kw)
            if F is not None:
                F.scaled = (dr, dc, A_s64, F_sc)
        b_arr = np.asarray(b, np.float64)
        bs = b_arr * (dr if b_arr.ndim == 1 else dr[:, None])
        z, _ = least_squares(A_s64, bs, F=F_sc, refine=refine,
                             method=method, damp=damp)
        z = np.asarray(z, np.float64)
        x = z * (dc if z.ndim == 1 else dc[:, None])
        if F is None:
            F = F_sc
        return (x if refine else jnp.asarray(x)), F
    if F is None:
        F = factorize(A, keep_q=(method == "qmult"), **fact_kw)

    def _switch_damped(Fh, A64, b, lam=None):
        """Augmented-system fallback, cached on the handle so repeated
        solves refactorize [A; lam*I] once (see QRFactorization.damped).
        Cache note: keyed on (lam, keep_q) only — the first damped call's
        ``fact_kw`` options stick for the handle's lifetime."""
        if lam is None:
            lam = float(Fh.tol if damp is None else damp)
        n = A64.shape[1]
        need_q = method == "qmult"
        if (Fh.damped is not None and Fh.damped[0] == lam
                and (not need_q or Fh.damped[2].keep_q)):
            _, A_aug, F_aug = Fh.damped
        else:
            A_aug = sp.vstack([A64, lam * sp.eye(n, format="csc")]).tocsc()
            F_aug = factorize(A_aug, keep_q=need_q, **fact_kw)
            Fh.damped = (lam, A_aug, F_aug)
        b64 = np.asarray(b, np.float64)
        bb = np.concatenate([b64, np.zeros((n,) + b64.shape[1:])], axis=0)
        return F_aug, A_aug, bb.astype(np.asarray(b).dtype)

    # the caller's handle is returned unchanged; the solve itself may run
    # on the cached augmented factorization (F_s/A_s/b_s)
    F_s, A_s, b_s = F, A64, b
    already_damped = False
    if F.rank < F.sym.n and (damp is None or damp > 0):
        F_s, A_s, b_s = _switch_damped(F, A64, b)
        already_damped = True
    if method == "seminormal":
        x = _seminormal_solve_once(F_s, A_s, b_s)
    elif method == "qmult":
        x = _qr_solve_once(F_s, b_s)
    else:
        raise ValueError("method must be 'qmult' or 'seminormal'")
    if not np.isfinite(np.asarray(x)).all() and (damp is None or damp > 0):
        # full-rank by the tolerance test, but diagonals barely above it
        # overflowed the working precision — same remedy as deficiency.
        # Always re-damp from the ORIGINAL system and cache on the
        # caller's handle; if the first damped solve itself overflowed,
        # escalate lambda rather than double-augmenting [A; λI; λI].
        lam0 = float(F.tol if damp is None else damp)
        lam = lam0 * 1e3 if already_damped else None
        F_s, A_s, b_s = _switch_damped(F, A64, b, lam=lam)
        x = (_seminormal_solve_once(F_s, A_s, b_s)
             if method == "seminormal" else _qr_solve_once(F_s, b_s))
    if refine:
        b64 = np.asarray(b_s, np.float64)
        m_orig = A64.shape[0]
        for _ in range(refine):
            # least-squares refinement: minimize over the correction d of
            # ‖A d − r‖ with r = b − A x (reuses the same factorization)
            r = b64 - A_s @ np.asarray(x, np.float64)
            if A_s.shape[0] > m_orig:
                # damped path: refine against the ORIGINAL system (zero the
                # augmented rows' residual, which carries −λx).  This turns
                # the loop into iterated Tikhonov — each pass shrinks the
                # ridge bias by λ²/(σ²+λ²) on the live spectrum, so the
                # solution converges to the true least-squares answer
                # instead of the ridge-biased one (keeping the λx rows
                # refines TOWARD the ridge solution, stuck at O(λ²/σ²)
                # residual — the round-4 stragglers).
                r[m_orig:] = 0.0
            if method == "seminormal":
                d = _seminormal_solve_once(F_s, A_s, r)
            else:
                d = _qr_solve_once(F_s, r.astype(np.float32))
            x = np.asarray(x, np.float64) + np.asarray(d, np.float64)
        return x, F  # keep the float64 accumulation (jnp would downcast)
    return jnp.asarray(x), F


def lq_min_norm_solve(A: sp.spmatrix, b,
                      **fact_kw) -> Tuple[jnp.ndarray, QRFactorization]:
    """Minimum-norm solution of an underdetermined ``A x = b`` via LQ —
    the ``SparseLQ`` role (``SparseLQ.c:691``), realized as QR of Aᵀ:
    ``A[q_rows, :] = Rᵀ Qᵀ`` ⇒ forward-solve Rᵀ z = b[q_rows], x = Q z."""
    A = sp.csc_matrix(A)
    F = factorize(A.T.tocsc(), keep_q=True, **fact_kw)
    b = jnp.asarray(b)
    squeeze = b.ndim == 1
    bb = b[:, None] if squeeze else b
    bq = bb[np.asarray(F.sym.q)]
    z = rsolve(F, bq, trans=True)
    qp = _q_plan(F)
    y = jnp.zeros((qp.n_q, bb.shape[1]), bb.dtype).at[:F.sym.n].set(z)
    x = qmult(F, y, "QX")
    return (x[:, 0] if squeeze else x), F
