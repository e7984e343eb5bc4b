"""Multifrontal sparse Cholesky (SPD), level-batched on the MXU.

Capability match: the reference's sparse Cholesky routines kept alongside
the QR (``STMMQR/src/chol/``: ``SparseChol_super_symbolic`` front
construction, ``SparseChol_super_numeric`` factorization,
``SparseChol_solve``'s ``t_lsolve``/``t_ltsolve`` triangular solves —
SURVEY.md C5 "full sparse Cholesky factorize/solve routines kept for
completeness").

Same TPU design language as the QR (`numeric.py`), with the one structural
difference of the Cholesky multifrontal method: assembly is **extend-add**
(child update matrices overlap parent rows/columns and must be summed),
not row stacking.  Realized as row-granular ``.add`` scatters of one-hot
column-aligned child blocks — duplicate destination rows across children
are correctly summed by XLA's scatter-add.

Per padded bucket the factor step is three MXU-native batched ops:
``cholesky(A11)`` → ``L21 = A21·L11⁻ᵀ`` (triangular solve) →
``CB = A22 − L21·L21ᵀ`` (syrk).  Padded pivot slots carry an identity
diagonal, which makes eliminating them an exact no-op.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from .numeric import _expand_rows, _pad_dim
from .symbolic import (
    ORDER_AMD, ORDER_NATURAL, ORDER_GIVEN, Front, postorder,
)


# --------------------------------------------------------------------------
# symmetric symbolic analysis
# --------------------------------------------------------------------------

def sym_etree(A: sp.csc_matrix) -> np.ndarray:
    """Elimination tree of a symmetric matrix (Liu's algorithm with path
    compression; uses the strict upper triangle of each column)."""
    n = A.shape[1]
    Ap, Ai = A.indptr, A.indices
    parent = np.full(n, -1, np.int64)
    ancestor = np.full(n, -1, np.int64)
    for k in range(n):
        for p in range(Ap[k], Ap[k + 1]):
            i = Ai[p]
            while i != -1 and i < k:
                nxt = ancestor[i]
                ancestor[i] = k
                if nxt == -1:
                    parent[i] = k
                i = nxt
    return parent


@dataclass
class CholSymbolic:
    n: int
    perm: np.ndarray                 # Ap = A[perm][:, perm]
    parent: np.ndarray
    fronts: List[Front]
    levels: List[List[int]]
    col_to_front: np.ndarray
    nnz_L: int
    flops: float


def analyze_spd(A: sp.spmatrix, ordering: int = ORDER_AMD,
                given: Optional[np.ndarray] = None,
                nrelax: int = 4, zrelax: float = 0.25) -> CholSymbolic:
    """Supernodal symbolic Cholesky — ``SparseChol_super_symbolic`` role
    (``SparseChol_super_symbolic.c:193-360``): symmetric etree, per-column
    L patterns, fundamental supernodes, relaxed amalgamation
    (nrelax/zrelax = the reference's ``Relaxfactor_setting`` knobs)."""
    A = sp.csc_matrix(A)
    A = ((A + A.T) * 0.5).tocsc()  # symmetrize (values and pattern)
    n = A.shape[1]

    # fill-reducing ordering on A's own graph
    if ordering == ORDER_NATURAL:
        perm0 = np.arange(n, dtype=np.int64)
    elif ordering == ORDER_GIVEN:
        perm0 = np.asarray(given, np.int64)
    else:
        from .. import native
        coo = sp.triu(A, k=1).tocoo()
        s = np.concatenate([coo.row, coo.col])
        d = np.concatenate([coo.col, coo.row])
        if not native.native_available():
            perm0 = np.arange(n, dtype=np.int64)
        elif ordering in (0, 1):
            # solver path: supervariable AMD (fast mode; see native.order_fast)
            perm0 = native.order_fast(s, d, n).astype(np.int64)
        else:
            method = {2: native.METHOD_NESTED_DISSECTION,
                      3: native.METHOD_NESDIS}[ordering]
            perm0 = native.order(s, d, n, method).astype(np.int64)

    Ap0 = A[perm0][:, perm0].tocsc()
    parent0 = sym_etree(Ap0)
    post = postorder(parent0)
    perm = perm0[post]
    Apm = A[perm][:, perm].tocsc()
    inv = np.empty(n, np.int64)
    inv[post] = np.arange(n)
    parent = np.full(n, -1, np.int64)
    nz = parent0 >= 0
    parent[inv[nz]] = inv[parent0[nz]]

    # children lists
    children: List[List[int]] = [[] for _ in range(n)]
    for j in range(n):
        if parent[j] != -1:
            children[parent[j]].append(j)

    # per-column L patterns: {j} ∪ below-diag(A col j) ∪ (∪ child \ {child})
    Lp, Li = Apm.indptr, Apm.indices
    patterns: List[np.ndarray] = [None] * n  # type: ignore
    for j in range(n):
        pieces = [np.array([j], np.int64)]
        below = Li[Lp[j]:Lp[j + 1]]
        pieces.append(below[below > j].astype(np.int64))
        for c in children[j]:
            pieces.append(patterns[c][1:])
        patterns[j] = np.unique(np.concatenate(pieces))

    # fundamental supernodes + relaxed amalgamation (QR rules verbatim)
    sn_of = np.empty(n, np.int64)
    sn_first: List[int] = []
    for j in range(n):
        if (j > 0 and parent[j - 1] == j
                and len(patterns[j]) == len(patterns[j - 1]) - 1):
            sn_of[j] = sn_of[j - 1]
        else:
            sn_of[j] = len(sn_first)
            sn_first.append(j)
    nsn = len(sn_first)
    sn_last = [sn_first[k + 1] - 1 if k + 1 < nsn else n - 1
               for k in range(nsn)]
    sn_parent = np.full(nsn, -1, np.int64)
    for k in range(nsn):
        p = parent[sn_last[k]]
        if p != -1:
            sn_parent[k] = sn_of[p]
    merged_into = np.full(nsn, -1, np.int64)

    def find_live(k):
        while merged_into[k] != -1:
            k = merged_into[k]
        return k

    sn_piv = [list(range(sn_first[k], sn_last[k] + 1)) for k in range(nsn)]
    sn_pat = [np.unique(np.concatenate([patterns[j] for j in sn_piv[k]]))
              for k in range(nsn)]
    for k in range(nsn - 1, -1, -1):
        p = sn_parent[k]
        if p == -1:
            continue
        p = find_live(p)
        if sn_piv[p][0] != sn_piv[k][-1] + 1:
            continue
        merged = np.unique(np.concatenate([sn_pat[k], sn_pat[p]]))
        npiv_new = len(sn_piv[k]) + len(sn_piv[p])
        nz_real = sum(len(patterns[j]) for j in sn_piv[k] + sn_piv[p])
        nz_merged = sum(len(merged) - i for i in range(npiv_new))
        zfrac = 1.0 - nz_real / max(nz_merged, 1)
        if len(sn_piv[k]) <= nrelax or zfrac <= zrelax:
            sn_piv[p] = sn_piv[k] + sn_piv[p]
            sn_pat[p] = merged
            merged_into[k] = p

    live = [k for k in range(nsn) if merged_into[k] == -1]
    fronts: List[Front] = []
    col_to_front = np.empty(n, np.int64)
    for i, k in enumerate(live):
        piv = np.asarray(sn_piv[k], np.int64)
        cols = sn_pat[k]
        assert np.array_equal(cols[:len(piv)], piv)
        fronts.append(Front(fid=i, pivots=piv, cols=cols,
                            srows=np.zeros(0, np.int64)))
        col_to_front[piv] = i
    for i, f in enumerate(fronts):
        pp = parent[f.pivots[-1]]
        f.parent = -1 if pp == -1 else int(col_to_front[pp])
    for f in fronts:
        if f.parent != -1:
            fronts[f.parent].children.append(f.fid)
    nnz_L = 0
    flops = 0.0
    for f in fronts:
        f.level = 1 + max((fronts[c].level for c in f.children), default=-1)
        f.fm = f.fn
        f.cb_rows = f.fn - f.npiv
        nnz_L += sum(f.fn - t for t in range(f.npiv))
        flops += sum((f.fn - t) ** 2 for t in range(f.npiv))
    max_level = max((f.level for f in fronts), default=-1)
    levels = [[] for _ in range(max_level + 1)]
    for f in fronts:
        levels[f.level].append(f.fid)
    return CholSymbolic(n=n, perm=perm, parent=parent, fronts=fronts,
                        levels=levels, col_to_front=col_to_front,
                        nnz_L=nnz_L, flops=flops)


# --------------------------------------------------------------------------
# numeric plan
# --------------------------------------------------------------------------

@dataclass
class CholBucket:
    fids: List[int]
    np_pad: int                       # padded pivot count
    d_pad: int                        # padded front dimension
    ell_start: int = 0
    ell_count: int = 0                # assembly rows (one per front row slot)
    ell_lc: np.ndarray = None         # (count, K) pivot slot | −1
    a_dst: np.ndarray = None          # (count,) rows in B·d_pad
    cb_groups: List[Tuple] = field(default_factory=list)
    piv_mask: np.ndarray = None       # (B, np_pad) true pivots
    pool_base: int = 0
    level_idx: int = 0
    bucket_idx: int = 0

    @property
    def batch(self):
        return len(self.fids)


@dataclass
class CholPlan:
    sym: CholSymbolic
    buckets: List[List[CholBucket]]
    pool_size: int
    ell_K: int
    ell_perm: np.ndarray              # (rows, K) → Apm.data | −1
    Apm: sp.csc_matrix
    diag_idx: np.ndarray
    # per-front slot bookkeeping for solves
    # (front slot r ↦ local position: pivots at [0,npiv), ancestors at
    #  np_pad + idx)


def _slot(front: Front, np_pad: int, local: int) -> int:
    """Local position of pattern index ``local`` inside the padded front."""
    return local if local < front.npiv else np_pad + (local - front.npiv)


def build_chol_plan(sym: CholSymbolic, Apm: sp.csc_matrix) -> CholPlan:
    fronts = sym.fronts
    Apm = Apm.tocsc()
    Apm.sum_duplicates()
    Cp, Ci = Apm.indptr, Apm.indices

    buckets: List[List[CholBucket]] = []
    pool_total = 0
    for li, level_fids in enumerate(sym.levels):
        groups: Dict[Tuple[int, int], CholBucket] = {}
        for fid in level_fids:
            f = fronts[fid]
            key = (_pad_dim(f.npiv),
                   _pad_dim(_pad_dim(f.npiv) + (f.fn - f.npiv)))
            groups.setdefault(key, CholBucket([], *key)).fids.append(fid)
        lvl = list(groups.values())
        for bi, bk in enumerate(lvl):
            bk.pool_base = pool_total
            bk.level_idx, bk.bucket_idx = li, bi
            for b, fid in enumerate(bk.fids):
                f = fronts[fid]
                f.pool_off = pool_total + b * bk.d_pad * bk.d_pad
                f.fn_stride = bk.d_pad
            pool_total += bk.batch * bk.d_pad * bk.d_pad
        buckets.append(lvl)

    bucket_of = {fid: bk for lv in buckets for bk in lv for fid in bk.fids}

    # assembly-ordered A-part ELL: one row per (front, pattern slot),
    # entries = A values in the front's PIVOT columns at that row
    # (column-major harvest: entry (i, j), j pivot, i ∈ pattern)
    per_row_entries: List[List[Tuple[int, float]]] = []
    order_meta = []  # (bucket, front, local r)
    for lv in buckets:
        for bk in lv:
            bk.ell_start = len(order_meta)
            for fid in bk.fids:
                f = fronts[fid]
                for r in range(f.fn):
                    order_meta.append((bk, f, r))
                    per_row_entries.append([])
            bk.ell_count = len(order_meta) - bk.ell_start
    row_index = {}
    pos = 0
    for lv in buckets:
        for bk in lv:
            for fid in bk.fids:
                f = fronts[fid]
                for r in range(f.fn):
                    row_index[(fid, r)] = pos
                    pos += 1
    for lv in buckets:
        for bk in lv:
            for fid in bk.fids:
                f = fronts[fid]
                lookup = {int(c): idx for idx, c in enumerate(f.cols)}
                for t, j in enumerate(f.pivots):
                    for p in range(Cp[j], Cp[j + 1]):
                        i = int(Ci[p])
                        r = lookup.get(i)
                        if r is None:
                            continue  # above-pattern entry: belongs elsewhere
                        per_row_entries[row_index[(fid, r)]].append((t, p))

    K = max((len(e) for e in per_row_entries), default=1)
    K = max(K, 1)
    total_rows = len(per_row_entries)
    ell_perm = np.full((total_rows, K), -1, np.int64)
    for rix, ents in enumerate(per_row_entries):
        for k, (_t, p) in enumerate(ents):
            ell_perm[rix, k] = p

    for lv in buckets:
        for bk in lv:
            lc = np.full((bk.ell_count, K), -1, np.int32)
            dst = np.zeros(bk.ell_count, np.int32)
            pm = np.zeros((bk.batch, bk.np_pad), bool)
            pos = bk.ell_start
            for b, fid in enumerate(bk.fids):
                f = fronts[fid]
                pm[b, :f.npiv] = True
                for r in range(f.fn):
                    ents = per_row_entries[pos]
                    for k, (t, _p) in enumerate(ents):
                        lc[pos - bk.ell_start, k] = t  # pivot slot
                    dst[pos - bk.ell_start] = (
                        b * bk.d_pad + _slot(f, bk.np_pad, r))
                    pos += 1
            bk.ell_lc = lc
            bk.a_dst = dst
            bk.piv_mask = pm
            # child CB groups
            cb_by_src: Dict[int, List] = {}
            for b, fid in enumerate(bk.fids):
                f = fronts[fid]
                lookup = {int(c): idx for idx, c in enumerate(f.cols)}
                for cid in f.children:
                    c = fronts[cid]
                    w = c.fn - c.npiv
                    if w == 0:
                        continue
                    sb = bucket_of[cid]
                    # child CB rows live at slots np_pad_c + (0..w)
                    slot_row0 = ((c.pool_off - sb.pool_base) // sb.d_pad
                                 + sb.np_pad)
                    src_rows = slot_row0 + np.arange(w)
                    # column map: child slot → parent slot (CB cols start
                    # at the child's padded pivot offset)
                    cm = np.full(sb.d_pad, -1, np.int32)
                    for u in range(w):
                        pl = lookup[int(c.cols[c.npiv + u])]
                        cm[sb.np_pad + u] = _slot(f, bk.np_pad, pl)
                    dst_rows = np.asarray(
                        [b * bk.d_pad
                         + _slot(f, bk.np_pad, lookup[int(cc)])
                         for cc in c.cols[c.npiv:]], np.int32)
                    ent = cb_by_src.setdefault(id(sb), [sb, [], [], [], []])
                    child_no = len(ent[3])
                    ent[1].append(src_rows.astype(np.int32))
                    ent[2].append(np.full(w, child_no, np.int32))
                    ent[3].append(cm)
                    ent[4].append(dst_rows)
            bk.cb_groups = []
            for sb, srcs, r2c, cms, dsts in cb_by_src.values():
                bk.cb_groups.append((
                    sb.level_idx, sb.bucket_idx,
                    sb.batch * sb.d_pad, sb.d_pad,
                    np.concatenate(srcs), np.concatenate(r2c),
                    np.stack(cms), np.concatenate(dsts)))

    diag_idx = np.zeros(sym.n, np.int64)
    for f in fronts:
        t = np.arange(f.npiv, dtype=np.int64)
        diag_idx[f.pivots] = f.pool_off + t * f.fn_stride + t

    return CholPlan(sym=sym, buckets=buckets, pool_size=pool_total,
                    ell_K=K, ell_perm=ell_perm, Apm=Apm, diag_idx=diag_idx)


def chol_ell_values(plan: CholPlan,
                    Apm: Optional[sp.csc_matrix] = None) -> np.ndarray:
    data = (plan.Apm if Apm is None else Apm).data
    perm = plan.ell_perm
    return np.where(perm >= 0, data[np.maximum(perm, 0)], 0.0)


# --------------------------------------------------------------------------
# numeric factorization
# --------------------------------------------------------------------------

def _chol_bucket_meta(bk: CholBucket):
    return (bk.batch, bk.np_pad, bk.d_pad, bk.ell_start, bk.ell_count,
            tuple((sl, sb, rows, w) for (sl, sb, rows, w, *_)
                  in bk.cb_groups))


def _chol_bucket_arrays(bk: CholBucket):
    return (jnp.asarray(bk.ell_lc), jnp.asarray(bk.a_dst),
            jnp.asarray(bk.piv_mask),
            tuple((jnp.asarray(src), jnp.asarray(r2c), jnp.asarray(cm),
                   jnp.asarray(dst))
                  for (_, _, _, _, src, r2c, cm, dst) in bk.cb_groups))


def _chol_assemble(meta, arrays, slabs, vals_ell, dtype):
    (B, np_pad, d_pad, ell_start, ell_count, groups_meta) = meta
    (ell_lc, a_dst, piv_mask, group_arrays) = arrays
    buf = jnp.zeros((B * d_pad, d_pad), dtype)
    if ell_count:
        av = jax.lax.slice_in_dim(vals_ell, ell_start,
                                  ell_start + ell_count, axis=0)
        # A-part lands in the pivot columns only (lower representation)
        buf = buf.at[a_dst].add(_expand_rows(av, ell_lc, d_pad))
    for (sl, sb, slab_rows, slab_w), (src, r2c, cm, dst) in zip(
            groups_meta, group_arrays):
        slab = slabs[(sl, sb)].reshape(slab_rows, slab_w)
        cmap = cm[r2c]
        # extend-add: duplicate dst rows across children sum correctly
        buf = buf.at[dst].add(_expand_rows(slab[src], cmap, d_pad))
    return buf.reshape(B, d_pad, d_pad)


def _chol_factor_bucket(F, np_pad: int, piv_mask):
    """A11 → L11; L21 = A21 L11⁻ᵀ; CB = A22 − L21 L21ᵀ.  Padded pivot
    slots get an identity diagonal — eliminating them is a no-op."""
    B, d_pad, _ = F.shape
    mask = piv_mask  # (B, np_pad)
    A11 = F[:, :np_pad, :np_pad]
    mm = mask[:, :, None] & mask[:, None, :]
    A11 = jnp.where(mm, A11, 0.0) + jnp.eye(np_pad, dtype=F.dtype)[None] \
        * (~mask[:, :, None] * jnp.eye(np_pad, dtype=bool)[None])
    L11 = jnp.linalg.cholesky(A11)
    A21 = jnp.where(mask[:, None, :], F[:, np_pad:, :np_pad], 0.0)
    # L21ᵀ = L11⁻¹ A21ᵀ  (batched lower-triangular solve)
    L21t = jax.scipy.linalg.solve_triangular(
        L11, jnp.swapaxes(A21, 1, 2), lower=True)
    L21 = jnp.swapaxes(L21t, 1, 2)
    CB = F[:, np_pad:, np_pad:] - jnp.einsum(
        "bik,bjk->bij", L21, L21, preferred_element_type=F.dtype)
    top = jnp.concatenate(
        [L11, jnp.zeros((B, np_pad, d_pad - np_pad), F.dtype)], axis=2)
    bot = jnp.concatenate([L21, CB], axis=2)
    return jnp.concatenate([top, bot], axis=1)


def _make_chol_run(plan: CholPlan, dtype=jnp.float32):
    metas = [[_chol_bucket_meta(bk) for bk in lv] for lv in plan.buckets]
    arrays = tuple(tuple(_chol_bucket_arrays(bk) for bk in lv)
                   for lv in plan.buckets)
    keys = [[(bk.level_idx, bk.bucket_idx) for bk in lv]
            for lv in plan.buckets]

    @jax.jit
    def _run(vals_ell, arrs):
        slabs, order = {}, []
        for level_meta, level_arr, level_keys in zip(metas, arrs, keys):
            for bm, ba, k in zip(level_meta, level_arr, level_keys):
                F = _chol_assemble(bm, ba, slabs, vals_ell, dtype)
                out = _chol_factor_bucket(F, bm[1], ba[2])
                slabs[k] = out.reshape(-1)
                order.append(k)
        pool = (jnp.concatenate([slabs[k] for k in order])
                if order else jnp.zeros(0, dtype))
        return pool

    def run(vals_ell):
        return _run(vals_ell, arrays)

    run.raw = _run
    run.arrays = arrays
    return run


@dataclass
class CholFactorization:
    sym: CholSymbolic
    plan: CholPlan
    pool: object
    diag: np.ndarray
    dtype: object = np.float32

    def L_csr(self) -> sp.csr_matrix:
        """Global L (n×n lower triangular, permuted labels):
        A[perm][:, perm] = L·Lᵀ."""
        pool = np.asarray(self.pool)
        rows, cols, vals = [], [], []
        for f in self.sym.fronts:
            bk_np = f.fn_stride  # d_pad
            # recover np_pad from the plan via slot of first ancestor
            np_pad = _pad_dim(f.npiv)
            for t in range(f.npiv):
                # column t of the front: diagonal + below in pivot block,
                # then the L21 rows (ancestors)
                for r in range(t, f.npiv):
                    off = f.pool_off + r * f.fn_stride + t
                    rows.append(f.pivots[r]); cols.append(f.pivots[t])
                    vals.append(pool[off])
                for u in range(f.fn - f.npiv):
                    off = f.pool_off + (np_pad + u) * f.fn_stride + t
                    rows.append(f.cols[f.npiv + u]); cols.append(f.pivots[t])
                    vals.append(pool[off])
        n = self.sym.n
        if not rows:
            return sp.csr_matrix((n, n))
        return sp.csr_matrix(
            (np.asarray(vals, np.float64), (rows, cols)), shape=(n, n))


def cholesky_factorize(A: sp.spmatrix, sym: Optional[CholSymbolic] = None,
                       ordering: int = ORDER_AMD,
                       given: Optional[np.ndarray] = None,
                       dtype=jnp.float32) -> CholFactorization:
    """Multifrontal Cholesky of an SPD matrix on the default JAX backend."""
    A = sp.csc_matrix(A)
    if sym is None:
        sym = analyze_spd(A, ordering, given=given)
    Apm = ((A + A.T) * 0.5)[sym.perm][:, sym.perm].tocsc()
    plan = getattr(sym, "_plan", None)
    if plan is None:
        plan = build_chol_plan(sym, Apm)
        sym._plan = plan
    run = getattr(sym, "_run", None)
    if run is None or getattr(sym, "_run_dtype", None) != np.dtype(dtype):
        run = _make_chol_run(plan, dtype)
        sym._run = run
        sym._run_dtype = np.dtype(dtype)
    Apm2 = Apm.copy()
    Apm2.sum_duplicates()
    vals = jnp.asarray(chol_ell_values(plan, Apm2), dtype)
    pool = run(vals)
    diag = np.asarray(pool[jnp.asarray(plan.diag_idx)])
    return CholFactorization(sym=sym, plan=plan, pool=pool, diag=diag,
                             dtype=dtype)


# --------------------------------------------------------------------------
# triangular solves (t_lsolve / t_ltsolve roles)
# --------------------------------------------------------------------------

def chol_solve(F: CholFactorization, b, refine: int = 0) -> np.ndarray:
    """Solve A x = b via the multifrontal factor: permute, L-forward,
    Lᵀ-backward, unpermute.  ``refine`` adds float64-residual iterative
    refinement (the TPU f32 story, as in the QR)."""
    sym, plan = F.sym, F.plan
    b = np.asarray(b)
    squeeze = b.ndim == 1
    bb = b[:, None] if squeeze else b
    pool = jnp.asarray(F.pool)

    solver = getattr(plan, "_solver", None)
    if solver is None:
        solver = _make_chol_solver(plan)
        plan._solver = solver

    def solve_once(rhs):
        yp = jnp.asarray(rhs[np.asarray(sym.perm)], F.pool.dtype)
        xperm = np.asarray(solver(pool, yp))
        out = np.empty_like(xperm)
        out[np.asarray(sym.perm)] = xperm
        return out

    x = solve_once(bb)
    if refine:
        A64 = ((plan.Apm).astype(np.float64))
        # Apm is the permuted matrix; rebuild the unpermuted operator
        P = np.asarray(sym.perm)
        iperm = np.empty_like(P)
        iperm[P] = np.arange(len(P))
        A_un = A64[iperm][:, iperm]
        b64 = np.asarray(bb, np.float64)
        for _ in range(refine):
            r = b64 - A_un @ np.asarray(x, np.float64)
            x = np.asarray(x, np.float64) + np.asarray(
                solve_once(r.astype(np.float32)), np.float64)
    return x[:, 0] if squeeze else x


def _make_chol_solver(plan: CholPlan):
    """Fused forward+backward triangular solve over the level schedule."""
    n = plan.sym.n
    fronts = plan.sym.fronts
    per_level = []
    for lv in plan.buckets:
        bks = []
        for bk in lv:
            B, npp, dp = bk.batch, bk.np_pad, bk.d_pad
            l11 = np.full((B, npp, npp), -1, np.int64)
            l21 = np.full((B, dp - npp, npp), -1, np.int64)
            piv = np.full((B, npp), n, np.int64)
            anc = np.full((B, dp - npp), n, np.int64)
            for b, fid in enumerate(bk.fids):
                f = fronts[fid]
                for r in range(f.npiv):
                    for t in range(r + 1):
                        l11[b, r, t] = f.pool_off + r * f.fn_stride + t
                w = f.fn - f.npiv
                for u in range(w):
                    for t in range(f.npiv):
                        l21[b, u, t] = (f.pool_off
                                        + (npp + u) * f.fn_stride + t)
                piv[b, :f.npiv] = f.pivots
                anc[b, :w] = f.cols[f.npiv:]
            bks.append(tuple(map(jnp.asarray, (l11, l21, piv, anc))))
        per_level.append(tuple(bks))
    levels = tuple(per_level)

    @jax.jit
    def solver(pool, bperm):
        k = bperm.shape[1]
        y = jnp.concatenate([bperm, jnp.zeros((1, k), bperm.dtype)])
        # forward: L y = b
        for lv in levels:
            for (l11, l21, piv, anc) in lv:
                T = jnp.where(l11 >= 0, pool[jnp.maximum(l11, 0)], 0.0)
                live = jnp.abs(jnp.diagonal(T, axis1=1, axis2=2)) > 0
                eye = jnp.eye(T.shape[1], dtype=pool.dtype)
                T = T + eye[None] * (~live)[:, :, None]
                rhs = y[piv] * live[..., None]
                sol = jax.scipy.linalg.solve_triangular(T, rhs, lower=True)
                y = y.at[piv].set(sol)
                L21 = jnp.where(l21 >= 0, pool[jnp.maximum(l21, 0)], 0.0)
                y = y.at[anc].add(-L21 @ sol)
        # backward: Lᵀ x = y
        x = jnp.zeros_like(y)
        for lv in reversed(levels):
            for (l11, l21, piv, anc) in lv:
                T = jnp.where(l11 >= 0, pool[jnp.maximum(l11, 0)], 0.0)
                live = jnp.abs(jnp.diagonal(T, axis1=1, axis2=2)) > 0
                eye = jnp.eye(T.shape[1], dtype=pool.dtype)
                T = T + eye[None] * (~live)[:, :, None]
                L21 = jnp.where(l21 >= 0, pool[jnp.maximum(l21, 0)], 0.0)
                rhs = (y[piv] - jnp.swapaxes(L21, 1, 2) @ x[anc])
                rhs = rhs * live[..., None]
                sol = jax.scipy.linalg.solve_triangular(
                    T, rhs, lower=True, trans=1)
                x = x.at[piv].set(sol)
        return x[:-1]

    return solver
