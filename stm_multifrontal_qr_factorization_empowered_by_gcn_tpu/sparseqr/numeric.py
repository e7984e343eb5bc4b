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
  a *static* row-granular movement plan (scalar scatters serialize and
  scalar gathers crawl on TPU — everything moves as ≥64-wide rows,
  contiguous slices, or fused one-hot contractions; see
  :func:`build_plan`);
* the numeric phase fuses the whole schedule into ONE jitted program
  (``_make_fused_run``) — batched Householder QR per bucket on the MXU,
  single device dispatch per factorization;
* all contribution blocks live inside a single flat ``pool`` array (each
  front owns an ``fn_pad×fn_pad`` slot in its bucket's contiguous slab),
  the TPU analog of the reference's per-task NUMA stacks
  (``SparseQR_factorize.c:405-425``).

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
    """Round a front dimension up to an MXU/VPU-friendly size class.
    Classes are ~1.33× apart (not powers of two): flop waste from padding
    is bounded by ~1.8× instead of 8×, at the cost of a few more compiled
    bucket shapes."""
    for s in (8, 16, 24, 32, 48, 64, 96, 128, 192, 256, 320, 384, 512):
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
    # ---- S-row assembly (row-granular; scalar gathers/scatters serialize
    # on TPU): this bucket's S rows are the contiguous slice
    # [ell_start, ell_start+ell_count) of the ELL value table, expanded to
    # front columns by a fused one-hot contraction over ell_lc, then
    # row-scattered to dst row ids.
    ell_start: int = 0
    ell_count: int = 0
    ell_lc: np.ndarray = field(default=None)     # (count, K) local col | −1
    s_dst: np.ndarray = field(default=None)      # (count,) rows in B·fm_pad
    # ---- child-CB assembly, grouped by the child's bucket: row-gather
    # from that bucket's R_F slab, one-hot column alignment, row-scatter.
    # Each group: (src_level, src_bucket, slab_rows, slab_width,
    # src_rows, row→child map, per-child colmaps, dst_rows).  Referencing
    # the child *slab* (not a monolithic pool) keeps the XLA dataflow
    # exact, so independent subtrees overlap instead of serializing on a
    # single pool value.
    cb_groups: List[Tuple] = field(default_factory=list)
    # this bucket's fronts own the contiguous padded pool region
    # [pool_base, pool_base + B·fn_pad²) of the final concatenated pool
    pool_base: int = 0
    level_idx: int = 0
    bucket_idx: int = 0

    @property
    def batch(self) -> int:
        return len(self.fids)


@dataclass
class QRPlan:
    sym: SymbolicQR
    St: sp.csr_matrix                 # row-major S (assembly-ordered rows)
    buckets: List[List[Bucket]]       # per level
    diag_idx: np.ndarray              # pool indices of R's diagonal (n,)
    maxcolnorm: float
    pool_size: int = 0                # padded pool (fn_pad² per front)
    ell_K: int = 0                    # ELL width (max nnz per used S row)
    ell_perm: np.ndarray = None       # (total_srows, K) → St.data | −1
    bucket_group: List[int] = None    # task-group id per buckets[] entry
    num_groups: int = 0               # 0 = ungrouped plan


def build_plan(sym: SymbolicQR, S: sp.csc_matrix,
               groups: Optional[np.ndarray] = None,
               num_groups: int = 0) -> QRPlan:
    """Lower the symbolic factorization to a static, row-granular plan.

    TPU rules encoded here (measured on v5e):
    * scalar scatters serialize and scalar gathers run ~80 M elem/s — so
      every data movement is row-granular (row gather ~10 GB/s, row
      scatter likewise) or a dynamic slice;
    * column alignment (child CB cols → parent front cols, S row cols →
      front cols) is a fused one-hot contraction ``einsum('rk,rkf->rf')``
      — XLA fuses the one-hot into the reduction, no materialization;
    * pool layout is bucket-contiguous and padded (fn_pad² per front), so
      packing a bucket's R_F is ONE ``dynamic_update_slice`` and a child
      bucket's slab reshapes to (B·fn_pad, fn_pad) for row gathers.
    """
    St = S.tocsr()
    St.sum_duplicates()
    Rp, Rj = St.indptr, St.indices
    fronts = sym.fronts

    # level schedule, optionally group-major (task-parallel execution:
    # groups < num_groups are independent subtree sets, group num_groups is
    # the shared top — the reference's streaming-task layout)
    if groups is None:
        level_lists = list(sym.levels)
        bucket_group: List[int] = [0] * len(level_lists)
    else:
        level_lists, bucket_group = [], []
        for g in range(num_groups + 1):
            for level_fids in sym.levels:
                sel = [fid for fid in level_fids if groups[fid] == g]
                if sel:
                    level_lists.append(sel)
                    bucket_group.append(g)

    # ---- pass 1: buckets + padded pool offsets ---------------------------
    buckets: List[List[Bucket]] = []
    pool_total = 0
    for li, level_fids in enumerate(level_lists):
        shape_groups: Dict[Tuple[int, int], Bucket] = {}
        for fid in level_fids:
            f = fronts[fid]
            key = (_pad_dim(max(f.fm, f.fn)), _pad_dim(f.fn))
            shape_groups.setdefault(key, Bucket([], *key)).fids.append(fid)
        level_buckets = list(shape_groups.values())
        for bi, bucket in enumerate(level_buckets):
            bucket.pool_base = pool_total
            bucket.level_idx = li
            bucket.bucket_idx = bi
            for b, fid in enumerate(bucket.fids):
                f = fronts[fid]
                f.pool_off = pool_total + b * bucket.fn_pad * bucket.fn_pad
                f.fn_stride = bucket.fn_pad
            pool_total += bucket.batch * bucket.fn_pad * bucket.fn_pad
        buckets.append(level_buckets)

    bucket_of = {}
    for lv in buckets:
        for bk in lv:
            for fid in bk.fids:
                bucket_of[fid] = bk

    # ---- pass 2: assembly-ordered ELL table for S rows --------------------
    row_nnz = np.diff(Rp)
    K = int(row_nnz.max(initial=1))
    order = []     # S row ids in assembly order
    for lv in buckets:
        for bk in lv:
            bk.ell_start = len(order)
            for fid in bk.fids:
                order.extend(fronts[fid].srows.tolist())
            bk.ell_count = len(order) - bk.ell_start
    total_srows = len(order)
    ell_perm = np.full((total_srows, K), -1, np.int64)
    for pos, i in enumerate(order):
        lo, hi = Rp[i], Rp[i + 1]
        ell_perm[pos, :hi - lo] = np.arange(lo, hi)

    # ---- pass 3: per-bucket local-column maps and destination rows --------
    for lv in buckets:
        for bk in lv:
            fm_pad, fn_pad = bk.fm_pad, bk.fn_pad
            lc_tab = np.full((bk.ell_count, K), -1, np.int32)
            s_dst = np.zeros(bk.ell_count, np.int32)
            pos = 0
            cb_by_src: Dict[int, List] = {}
            for b, fid in enumerate(bk.fids):
                f = fronts[fid]
                for lr, i in enumerate(f.srows):
                    lo, hi = Rp[i], Rp[i + 1]
                    lc_tab[pos, :hi - lo] = np.searchsorted(
                        f.cols, Rj[lo:hi]).astype(np.int32)
                    s_dst[pos] = b * fm_pad + lr
                    pos += 1
                row0 = len(f.srows)
                for cid in f.children:
                    c = fronts[cid]
                    if c.cb_rows > 0:
                        sb = bucket_of[cid]
                        w = c.fn - c.npiv
                        lc = np.searchsorted(f.cols, c.cols[c.npiv:])
                        # one compact column map per CHILD (every CB row of a
                        # child shares it) — materializing it per row blew
                        # past 2 GB of indices on fill-heavy matrices
                        cm = np.full(sb.fn_pad, -1, np.int32)
                        cm[c.npiv:c.fn] = lc
                        cb = c.cb_rows
                        slot_row0 = ((c.pool_off - sb.pool_base)
                                     // sb.fn_pad + c.npiv)
                        src_rows = slot_row0 + np.arange(cb)
                        dst_rows = b * fm_pad + row0 + np.arange(cb)
                        cb_by_src.setdefault(id(sb), [sb, [], [], [], []])
                        ent = cb_by_src[id(sb)]
                        child_no = len(ent[3])
                        ent[1].append(src_rows)
                        ent[2].append(np.full(cb, child_no, np.int32))
                        ent[3].append(cm)
                        ent[4].append(dst_rows)
                    row0 += c.cb_rows
            bk.ell_lc = lc_tab
            bk.s_dst = s_dst
            bk.cb_groups = []
            for sb, srcs, r2c, cms, dsts in cb_by_src.values():
                bk.cb_groups.append((
                    sb.level_idx, sb.bucket_idx,
                    sb.batch * sb.fn_pad, sb.fn_pad,
                    np.concatenate(srcs).astype(np.int32),
                    np.concatenate(r2c).astype(np.int32),
                    np.stack(cms).astype(np.int32),
                    np.concatenate(dsts).astype(np.int32)))

    diag_idx = np.zeros(sym.n, np.int64)
    for f in fronts:
        t = np.arange(f.npiv, dtype=np.int64)
        diag_idx[f.pivots] = f.pool_off + t * f.fn_stride + t

    colnorms = np.sqrt(np.asarray(
        S.multiply(S).sum(axis=0)).ravel()) if S.nnz else np.zeros(1)
    return QRPlan(sym=sym, St=St, buckets=buckets, diag_idx=diag_idx,
                  maxcolnorm=float(colnorms.max(initial=0.0)),
                  pool_size=pool_total, ell_K=K, ell_perm=ell_perm,
                  bucket_group=bucket_group,
                  num_groups=0 if groups is None else num_groups)


def ell_values(plan: QRPlan, St: Optional[sp.csr_matrix] = None) -> np.ndarray:
    """Assembly-ordered ELL value table (host-side; numpy fancy indexing)."""
    data = (plan.St if St is None else St).data
    perm = plan.ell_perm
    out = np.where(perm >= 0, data[np.maximum(perm, 0)], 0.0)
    return np.ascontiguousarray(out)


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
    # cache of the damped augmented-system factorization the rank-deficient
    # solve path falls back to: (lam, A_aug_csc, F_aug).  Filled lazily by
    # ``least_squares`` so repeated solves against one handle refactorize
    # [A; lam*I] once, not per call.
    damped: Optional[Tuple] = None
    # cache of the power-of-2 equilibrated factorization
    # (row_scale, col_scale, A_scaled_csc, F_scaled) — the
    # ``least_squares(equilibrate=True)`` path for badly scaled square
    # systems (the f32-front answer to the condition numbers the
    # reference absorbs with f64 fronts).
    scaled: Optional[Tuple] = None

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
                off = f.pool_off + t * f.fn_stride + t
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
    plan = getattr(sym, "_plan", None)
    if plan is None:
        plan = build_plan(sym, S)
        sym._plan = plan
    St = plan.St
    pool = np.zeros(plan.pool_size, np.float64)
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
                cRf = pool[c.pool_off:c.pool_off
                           + c.fn * c.fn_stride].reshape(c.fn, c.fn_stride)
                lc = np.searchsorted(f.cols, c.cols[c.npiv:])
                F[row0:row0 + c.cb_rows, lc] = cRf[
                    c.npiv:c.npiv + c.cb_rows, c.npiv:c.fn]
            row0 += c.cb_rows
        Rf = np.linalg.qr(F, mode="r")  # (fn, fn) since fm_eff ≥ fn
        slot = pool[f.pool_off:f.pool_off + f.fn * f.fn_stride].reshape(
            f.fn, f.fn_stride)
        slot[:, :f.fn] = np.triu(Rf)
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


def _expand_rows(vals, lc, width: int, chunk: int = 4096):
    """Column alignment: out[r, f] = Σ_k vals[r, k]·(lc[r, k] == f).
    XLA fuses the one-hot into the contraction (no materialization); the
    static chunking bounds the fused loop footprint."""
    outs = []
    n = vals.shape[0]
    for i in range(0, n, chunk):
        v = vals[i:min(i + chunk, n)]
        o = jax.nn.one_hot(lc[i:min(i + chunk, n)], width, dtype=v.dtype)
        outs.append(jnp.einsum("rk,rkf->rf", v, o))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs)


def _assemble(meta, arrays, slabs, vals_ell, dtype):
    """Front assembly = pure row stacking: slice the bucket's S rows from
    the assembly-ordered ELL table, align columns, row-scatter; then per
    child bucket, row-gather CB rows from that bucket's R_F *slab*, align
    columns, row-scatter.  All movement is row-granular, and referencing
    per-bucket slabs (not one pool array) gives XLA the exact dataflow —
    independent subtrees overlap.

    ``meta`` holds the static shape info; ``arrays`` the index arrays as
    *runtime arguments* (baking them in as constants inflates the HLO past
    the axon tunnel's upload limit)."""
    (B, fm_pad, fn_pad, pool_base, ell_start, ell_count, groups_meta) = meta
    (ell_lc, s_dst, group_arrays) = arrays
    buf = jnp.zeros((B * fm_pad, fn_pad), dtype)
    if ell_count:
        sv = jax.lax.slice_in_dim(vals_ell, ell_start,
                                  ell_start + ell_count, axis=0)
        buf = buf.at[s_dst].set(_expand_rows(sv, ell_lc, fn_pad))
    for (sl, sb, slab_rows, slab_w), (src, r2c, cm_compact, dst) in zip(
            groups_meta, group_arrays):
        slab = slabs[(sl, sb)].reshape(slab_rows, slab_w)
        cm = cm_compact[r2c]  # per-row column maps from per-child compact rows
        buf = buf.at[dst].set(_expand_rows(slab[src], cm, fn_pad))
    return buf.reshape(B, fm_pad, fn_pad)


def _extract_rf(R, fn_pad):
    """A bucket's R_F slab = upper triangles of the first fn_pad rows."""
    return jnp.triu(R[:, :fn_pad, :]).reshape(-1)


def _factor_bucket(F, keep_q: bool):
    if keep_q:
        Q, R = jax.lax.linalg.qr(F, full_matrices=True)
        return Q, R
    if _geqrf is not None:
        R, _ = _geqrf(F)
    else:
        _, R = jax.lax.linalg.qr(F, full_matrices=True)
    return None, R


def _bucket_meta(bk: Bucket):
    return (bk.batch, bk.fm_pad, bk.fn_pad, bk.pool_base,
            bk.ell_start, bk.ell_count,
            tuple((sl, sb, rows, w) for (sl, sb, rows, w, *_)
                  in bk.cb_groups))


def _bucket_arrays(bk: Bucket):
    return (jnp.asarray(bk.ell_lc), jnp.asarray(bk.s_dst),
            tuple((jnp.asarray(src), jnp.asarray(r2c), jnp.asarray(cm),
                   jnp.asarray(dst))
                  for (_, _, _, _, src, r2c, cm, dst) in bk.cb_groups))


def _make_fused_run(levels: List[List[Bucket]], keep_q: bool,
                    dtype=jnp.float32):
    """Fuse a level schedule into ONE jitted program (single device
    dispatch — essential under the axon tunnel, where each dispatch pays an
    RTT).  Per-bucket R_F *slabs* carry the inter-front dataflow, so XLA
    overlaps independent subtrees; the final pool is their concatenation
    in pool_base order.  Shape info is static; the index arrays travel as
    runtime arguments (device-resident after the first call) because
    constant-folding them inflates the serialized HLO past the tunnel's
    upload limit.  The compiled fn is cached on the symbolic object and
    reused for every re-factorization of the pattern."""
    metas = [[_bucket_meta(bk) for bk in level] for level in levels]
    arrays = tuple(tuple(_bucket_arrays(bk) for bk in level)
                   for level in levels)
    keys = [[(bk.level_idx, bk.bucket_idx) for bk in level]
            for level in levels]

    @partial(jax.jit, static_argnums=())
    def _run(_pool_unused, vals_ell, arrs):
        qs = []
        slabs = {}
        order = []
        for level_meta, level_arr, level_keys in zip(metas, arrs, keys):
            for bm, ba, k in zip(level_meta, level_arr, level_keys):
                F = _assemble(bm, ba, slabs, vals_ell, dtype)
                Q, R = _factor_bucket(F, keep_q)
                if keep_q:
                    qs.append(Q)
                slabs[k] = _extract_rf(R, bm[2])
                order.append(k)
        pool = (jnp.concatenate([slabs[k] for k in order])
                if order else jnp.zeros(0, dtype))
        return pool, qs

    def run(pool, vals_ell):
        return _run(pool, vals_ell, arrays)

    run.raw = _run
    run.arrays = arrays
    return run


def _make_group_run(bucket_lists: List[List[Bucket]], keep_q: bool,
                    dtype=jnp.float32):
    """A subset of the schedule as its own program: consumes externally
    produced slabs as arguments, returns its own slabs (keyed by the
    buckets' global (level_idx, bucket_idx)).  Used for the deep-plan
    per-level fallback and for task-parallel per-device group execution."""
    produced = [(bk.level_idx, bk.bucket_idx)
                for lv in bucket_lists for bk in lv]
    internal = set(produced)
    needed = sorted({(sl, sb) for lv in bucket_lists for bk in lv
                     for (sl, sb, *_rest) in bk.cb_groups}
                    - internal)
    metas = [[_bucket_meta(bk) for bk in lv] for lv in bucket_lists]
    arrays = tuple(tuple(_bucket_arrays(bk) for bk in lv)
                   for lv in bucket_lists)
    keys = [[(bk.level_idx, bk.bucket_idx) for bk in lv]
            for lv in bucket_lists]

    @jax.jit
    def _run(vals_ell, in_slabs, arrs):
        slabs = dict(zip(needed, in_slabs))
        outs, qs = [], []
        for level_meta, level_arr, level_keys in zip(metas, arrs, keys):
            for bm, ba, k in zip(level_meta, level_arr, level_keys):
                F = _assemble(bm, ba, slabs, vals_ell, dtype)
                Q, R = _factor_bucket(F, keep_q)
                if keep_q:
                    qs.append(Q)
                slabs[k] = _extract_rf(R, bm[2])
                outs.append(slabs[k])
        return tuple(outs), qs

    return needed, produced, lambda vals, ins: _run(vals, ins, arrays)


def factorize(A: sp.spmatrix, sym: Optional[SymbolicQR] = None,
              ordering: int = ORDER_COLAMD, tol: Optional[float] = None,
              keep_q: bool = False, dtype=jnp.float32,
              given=None) -> QRFactorization:
    """Level-batched multifrontal QR on the default JAX backend.

    ``keep_q=True`` retains each bucket's batched per-front orthogonal
    factors so :func:`~.solve.qmult` can apply Q/Qᵀ — the reference keeps
    the equivalent Householder blocks in ``QRnum`` for ``QR_qmult``
    (``SparseQR.c:1838``)."""
    A = sp.csc_matrix(A)
    if sym is None:
        sym = analyze(A, ordering, given=given)
    S = A[:, sym.q].tocsc()
    # plan index arrays depend only on the structure — cache on the symbolic
    # object so repeated factorizations (new values, same pattern) skip the
    # host-side plan build (the reference's analyze-once/factorize-many split)
    plan = getattr(sym, "_plan", None)
    if plan is None:
        plan = build_plan(sym, S)
        sym._plan = plan
    Stv = S.tocsr()
    Stv.sum_duplicates()  # canonical order must match the plan's St
    vals = jnp.asarray(ell_values(plan, Stv), dtype)
    q_data: Optional[List[List]] = [] if keep_q else None
    n_buckets = sum(len(lv) for lv in plan.buckets)
    cache = getattr(sym, "_fused", None) or {}
    dkey = np.dtype(dtype).name
    if n_buckets <= 256:
        # one fused program per (pattern, keep_q, dtype): single dispatch
        run = cache.get((keep_q, dkey))
        if run is None:
            run = _make_fused_run(plan.buckets, keep_q, dtype)
            cache[(keep_q, dkey)] = run
            sym._fused = cache
        pool, qs = run(jnp.zeros(0, dtype), vals)
        if keep_q:
            it = iter(qs)
            q_data = [[next(it) for _ in lv] for lv in plan.buckets]
    else:
        # very deep/wide plans: per-level programs bound compile time;
        # slabs thread between the per-level dispatches
        runs = cache.get(("perlevel", keep_q, dkey))
        if runs is None:
            runs = [_make_group_run([lv], keep_q, dtype)
                    for lv in plan.buckets]
            cache[("perlevel", keep_q, dkey)] = runs
            sym._fused = cache
        store = {}
        for (needed, produced, run) in runs:
            outs, qs = run(vals, tuple(store[k] for k in needed))
            for k, slab in zip(produced, outs):
                store[k] = slab
            if keep_q:
                q_data.append(list(qs))
        order = [(bk.level_idx, bk.bucket_idx)
                 for lv in plan.buckets for bk in lv]
        pool = (jnp.concatenate([store[k] for k in order])
                if order else jnp.zeros(0, dtype))
    # gather the diagonal on device — pulling the whole pool to host costs
    # seconds through the tunnel for big factors
    diag = np.asarray(pool[jnp.asarray(plan.diag_idx)])
    t = default_tol(sym.m, sym.n, plan.maxcolnorm,
                    np.dtype(dtype)) if tol is None else tol
    return QRFactorization(sym=sym, plan=plan, pool=pool, tol=t,
                           rank=int((np.abs(diag) > t).sum()), diag=diag,
                           backend="jax", q_data=q_data, dtype=dtype)


def factorize_taskparallel(A: sp.spmatrix, sym: Optional[SymbolicQR] = None,
                           ordering: int = ORDER_COLAMD,
                           tol: Optional[float] = None,
                           devices: Optional[Sequence] = None,
                           dtype=jnp.float32) -> QRFactorization:
    """Multi-device multifrontal QR — the reference's *streaming task
    mapping* (TPSM, ``SparseQR_multithreads.c:14-115`` +
    ``SparseQR_analyze.c:705-860``) retargeted from NUMA-pinned threads to
    mesh devices: the front forest is cut into flop-balanced independent
    subtree groups, each group's level schedule runs as its own program on
    its own device (JAX dispatches them asynchronously, so groups execute
    concurrently), and the shared top consumes the group roots'
    contribution blocks on device 0 — the tag barrier of the reference
    becomes XLA dataflow through transferred slabs.

    R-only (Q application is not supported in this mode; use the
    seminormal solve).  Produces a pool bit-compatible with the
    single-device layout, so all solve paths work unchanged.
    """
    from .symbolic import partition_tasks

    A = sp.csc_matrix(A)
    if sym is None:
        sym = analyze(A, ordering)
    devices = list(devices if devices is not None else jax.devices())
    P = len(devices)
    S = A[:, sym.q].tocsc()

    cache = getattr(sym, "_tp_cache", None)
    if cache is None or cache["P"] != P:
        groups = partition_tasks(sym, P)
        plan = build_plan(sym, S, groups=groups, num_groups=P)
        group_lists = [[] for _ in range(P + 1)]
        for lv, g in zip(plan.buckets, plan.bucket_group):
            group_lists[g].append(lv)
        runs = [_make_group_run(gl, False, dtype) if gl else None
                for gl in group_lists]
        cache = {"P": P, "plan": plan, "runs": runs}
        sym._tp_cache = cache
        # note: grouped plan rebinds front pool offsets; invalidate the
        # single-device caches tied to the old layout
        sym._plan = plan
        sym._fused = {}
        for stale in ("_rsolve_plan", "_q_plan", "_rsolve_runs", "_q_runs"):
            if hasattr(plan, stale):
                delattr(plan, stale)
    plan, runs = cache["plan"], cache["runs"]

    Stv = S.tocsr()
    Stv.sum_duplicates()
    vals_host = ell_values(plan, Stv).astype(np.dtype(dtype))
    vals_dev = [jax.device_put(vals_host, d) for d in devices]

    store = {}
    # dispatch the P independent groups (async — they run concurrently)
    for g in range(P):
        if runs[g] is None:
            continue
        needed, produced, run = runs[g]
        assert not needed, "independent groups consume no external slabs"
        outs, _ = run(vals_dev[g], ())
        for k, slab in zip(produced, outs):
            store[k] = slab
    # top group on device 0, consuming transferred group-root slabs
    if runs[P] is not None:
        needed, produced, run = runs[P]
        ins = tuple(jax.device_put(store[k], devices[0]) for k in needed)
        outs, _ = run(vals_dev[0], ins)
        for k, slab in zip(produced, outs):
            store[k] = slab

    order = [(bk.level_idx, bk.bucket_idx)
             for lv in plan.buckets for bk in lv]
    pool = (jnp.concatenate([jax.device_put(store[k], devices[0])
                             for k in order])
            if order else jnp.zeros(0, dtype))
    diag = np.asarray(pool[jnp.asarray(plan.diag_idx)])
    t = default_tol(sym.m, sym.n, plan.maxcolnorm,
                    np.dtype(dtype)) if tol is None else tol
    return QRFactorization(sym=sym, plan=plan, pool=pool, tol=t,
                           rank=int((np.abs(diag) > t).sum()), diag=diag,
                           backend="jax", dtype=dtype)
