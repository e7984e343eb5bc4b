"""Structural invariants of the multifrontal QR symbolic analysis.

Reference behavior being matched: ``qr_analyze``
(``STMMQR/src/qr/SparseQR_analyze.c``) — front construction over the
column etree of AᵀA.  The reference has no unit tests for this layer (its
correctness witness is the end-to-end solve residual, ``qrtest.c:11-53``);
these tests assert the invariants the multifrontal method rests on.
"""
import numpy as np
import pytest
import scipy.sparse as sp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.sparseqr import (
    ORDER_NATURAL, analyze, column_etree, postorder,
)


def _random_sparse(m, n, density, seed):
    rng = np.random.default_rng(seed)
    A = sp.random(m, n, density=density, random_state=rng,
                  data_rvs=lambda k: rng.normal(size=k) + 0.1)
    # ensure no empty column (keeps structural rank plausible)
    diag = sp.coo_matrix(
        (rng.normal(size=min(m, n)) + 1.0,
         (np.arange(min(m, n)), np.arange(min(m, n)))), shape=(m, n))
    return (A + diag).tocsc()


def test_column_etree_hand_example():
    # arrow matrix: every column shares a row with column 0 after AᵀA,
    # so the etree is a single chain 0→1→…→n−1.
    n = 6
    rows = np.concatenate([[0] * n, np.arange(1, n)])
    cols = np.concatenate([np.arange(n), np.arange(1, n)])
    A = sp.csc_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n))
    parent = column_etree(A)
    assert parent.tolist() == [1, 2, 3, 4, 5, -1]


def test_postorder_children_before_parents():
    parent = np.array([2, 2, 4, 4, -1])
    post = postorder(parent)
    pos = np.empty(len(parent), int)
    pos[post] = np.arange(len(parent))
    for j, p in enumerate(parent):
        if p != -1:
            assert pos[j] < pos[p]
    assert sorted(post.tolist()) == list(range(5))


@pytest.mark.parametrize("seed", [0, 1])
def test_front_invariants(seed):
    A = _random_sparse(60, 40, 0.08, seed)
    sym = analyze(A, ORDER_NATURAL)
    n = A.shape[1]
    seen_pivots = np.zeros(n, bool)
    seen_rows = np.zeros(A.shape[0], int)
    for f in sym.fronts:
        # pivots contiguous, pattern starts with them, rest are ancestors
        assert np.array_equal(f.pivots,
                              np.arange(f.pivots[0], f.pivots[-1] + 1))
        assert np.array_equal(f.cols[:f.npiv], f.pivots)
        assert np.all(f.cols[f.npiv:] > f.pivots[-1])
        assert not seen_pivots[f.pivots].any()
        seen_pivots[f.pivots] = True
        seen_rows[f.srows] += 1
        # child CB columns must be a subset of the parent's pattern
        for cid in f.children:
            c = sym.fronts[cid]
            assert np.all(np.isin(c.cols[c.npiv:], f.cols))
        # row count bookkeeping
        assert f.fm == len(f.srows) + sum(
            sym.fronts[c].cb_rows for c in f.children)
        assert f.cb_rows == max(0, min(f.fm, f.fn) - f.npiv)
    assert seen_pivots.all()
    # every nonempty row of S assigned to exactly one front
    S = A[:, sym.q].tocsr()
    nonempty = np.diff(S.indptr) > 0
    assert np.array_equal(seen_rows > 0, nonempty)
    assert seen_rows.max(initial=0) <= 1


def test_levels_schedule_children_strictly_below():
    A = _random_sparse(80, 50, 0.06, 7)
    sym = analyze(A)
    for f in sym.fronts:
        for cid in f.children:
            assert sym.fronts[cid].level < f.level
    flat = sorted(fid for level in sym.levels for fid in level)
    assert flat == list(range(len(sym.fronts)))


def test_amalgamation_reduces_front_count():
    A = _random_sparse(120, 80, 0.05, 3)
    relaxed = analyze(A, nrelax=8, zrelax=0.4)
    strict = analyze(A, nrelax=0, zrelax=0.0)
    assert len(relaxed.fronts) <= len(strict.fronts)
    # both must cover all columns
    assert sum(f.npiv for f in relaxed.fronts) == A.shape[1]
    assert sum(f.npiv for f in strict.fronts) == A.shape[1]


def test_ordering_reduces_fill_vs_natural():
    # 2D grid Laplacian-ish rectangular matrix: fill-reducing orderings
    # must not be (much) worse than natural.
    k = 12
    n = k * k
    ii, jj = np.meshgrid(np.arange(k), np.arange(k), indexing="ij")
    idx = (ii * k + jj).ravel()
    rows, cols, vals = [idx], [idx], [np.full(n, 4.0)]
    for di, dj in ((0, 1), (1, 0)):
        src = (ii[:k - di, :k - dj] * k + jj[:k - di, :k - dj]).ravel()
        dst = ((ii[:k - di, :k - dj] + di) * k
               + (jj[:k - di, :k - dj] + dj)).ravel()
        rows += [src, dst]
        cols += [dst, src]
        vals += [np.full(len(src), -1.0)] * 2
    A = sp.csc_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n, n))
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu import native
    if not native.native_available():
        pytest.skip("native ordering library unavailable")
    nat = analyze(A, ORDER_NATURAL)
    best = min(analyze(A, o).nnz_R for o in range(3))
    assert best <= nat.nnz_R * 1.05
