"""Native ordering library: exact symbolic-fill validation against a naive
set-based elimination, permutation validity, and labeler behavior."""
import numpy as np
import pytest

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu import native

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native library not built"
)


def _naive_fill(n, senders, receivers, perm):
    """Reference elimination: lnz = sum over elimination steps of
    |higher-ordered neighbors| + 1, updating the graph with the clique."""
    adj = [set() for _ in range(n)]
    for a, b in zip(senders, receivers):
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    pos = np.empty(n, np.int64)
    pos[perm] = np.arange(n)
    eliminated = set()
    lnz = 0
    for v in perm:
        boundary = {u for u in adj[v] if u not in eliminated}
        lnz += len(boundary) + 1
        for a in boundary:
            adj[a] |= boundary - {a}
            adj[a].discard(v)
        eliminated.add(v)
    return lnz


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_symbolic_fill_exact(seed):
    rng = np.random.default_rng(seed)
    n, e = 40, 120
    s = rng.integers(0, n, e).astype(np.int32)
    d = rng.integers(0, n, e).astype(np.int32)
    for method in (0, 1, 2, 3):
        perm = native.order(s, d, n, method)
        assert sorted(perm.tolist()) == list(range(n))
        lnz, _ = native.symbolic_fill(s, d, n, perm)
        assert lnz == _naive_fill(n, s, d, perm), native.ORDERING_NAMES[method]
    # natural order too
    nat = np.arange(n, dtype=np.int32)
    lnz, _ = native.symbolic_fill(s, d, n, nat)
    assert lnz == _naive_fill(n, s, d, nat)


def test_min_degree_beats_natural_on_grid():
    n = 20
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    nid = ii * n + jj
    s = np.concatenate([nid[:-1, :].ravel(), nid[:, :-1].ravel()]).astype(np.int32)
    d = np.concatenate([nid[1:, :].ravel(), nid[:, 1:].ravel()]).astype(np.int32)
    N = n * n
    lnz_nat, _ = native.symbolic_fill(s, d, N, np.arange(N, dtype=np.int32))
    lnz_md, _ = native.symbolic_fill(s, d, N, native.order(s, d, N, 0))
    lnz_nd, _ = native.symbolic_fill(s, d, N, native.order(s, d, N, 2))
    assert lnz_md < 0.7 * lnz_nat
    assert lnz_nd < 0.7 * lnz_nat


def test_partition_balanced_and_total():
    rng = np.random.default_rng(0)
    n, e = 200, 800
    s = rng.integers(0, n, e).astype(np.int32)
    d = rng.integers(0, n, e).astype(np.int32)
    part = native.bfs_partition(s, d, n, 4)
    counts = np.bincount(part, minlength=4)
    assert counts.sum() == n
    assert counts.max() <= -(-n // 4) + 1


def test_label_matrix_on_real_mtx():
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.io.mtx import read_mtx

    t = read_mtx("data/matrices/dwt_992.mtx")
    best, fills = native.label_matrix(
        t.rows.astype(np.int32), t.cols.astype(np.int32), t.nrow, t.ncol
    )
    assert best in (0, 1, 2, 3)
    assert len(fills) == 4
    assert all(v > t.ncol for v in fills.values())  # lnz >= diagonal count


def _grid_edges(k):
    idx = np.arange(k * k).reshape(k, k)
    s = np.concatenate([idx[:, :-1].ravel(), idx[:-1, :].ravel()])
    d = np.concatenate([idx[:, 1:].ravel(), idx[1:, :].ravel()])
    return s.astype(np.int32), d.astype(np.int32), k * k


def test_multilevel_nd_beats_min_degree_on_grid():
    """Multilevel ND (HEM + FM + vertex separator) must produce *less* fill
    than min-degree on a dissection-friendly 2D grid — the property the old
    BFS level-set bisection could not deliver (VERDICT r1 item 6)."""
    s, d, n = _grid_edges(40)
    fills = {}
    for m in (native.METHOD_MIN_DEGREE, native.METHOD_NESTED_DISSECTION,
              native.METHOD_NESDIS):
        p = native.order(s, d, n, m)
        assert sorted(p.tolist()) == list(range(n))
        fills[m], _ = native.symbolic_fill(s, d, n, p)
    assert fills[native.METHOD_NESTED_DISSECTION] < fills[native.METHOD_MIN_DEGREE]
    assert fills[native.METHOD_NESDIS] < fills[native.METHOD_MIN_DEGREE]


def test_ml_partition_cut_beats_bfs():
    s, d, n = _grid_edges(64)
    for parts in (4, 8):
        pb = native.bfs_partition(s, d, n, parts)
        pm = native.ml_partition(s, d, n, parts)
        assert set(pm.tolist()) == set(range(parts))
        cut_b = int(np.sum(pb[s] != pb[d]))
        cut_m = int(np.sum(pm[s] != pm[d]))
        assert cut_m < cut_b
        # balance within 25% of ideal
        sizes = np.bincount(pm, minlength=parts)
        assert sizes.max() <= 1.25 * n / parts


def test_order_fast_valid_and_competitive_on_grid():
    """Supervariable AMD (solver-path fast mode): a valid permutation whose
    fill is within 2x of the exact-order MD on a 2D grid (in practice it is
    usually *lower* — tight external degrees order better)."""
    s, d, n = _grid_edges(32)
    pe = native.order(s, d, n, native.METHOD_MIN_DEGREE)
    pf = native.order_fast(s, d, n)
    assert sorted(pf.tolist()) == list(range(n))
    fe, _ = native.symbolic_fill(s, d, n, pe)
    ff, _ = native.symbolic_fill(s, d, n, pf)
    assert ff < 2 * fe


def test_order_fast_supervariables_on_clique_chain():
    """A chain of 8-cliques is full of indistinguishable variables: the
    fast mode must produce an ordering at least as good as exact MD (both
    should find the no-fill elimination: cliques already complete)."""
    rng = np.random.default_rng(0)
    blocks = 20
    s_l, d_l = [], []
    for b in range(blocks):
        ids = np.arange(b * 8, b * 8 + 8)
        a = np.repeat(ids, 8); c = np.tile(ids, 8)
        m = a < c
        s_l.append(a[m]); d_l.append(c[m])
        if b:
            s_l.append(np.array([b * 8 - 1])); d_l.append(np.array([b * 8]))
    s = np.concatenate(s_l).astype(np.int32)
    d = np.concatenate(d_l).astype(np.int32)
    n = blocks * 8
    pf = native.order_fast(s, d, n)
    assert sorted(pf.tolist()) == list(range(n))
    ff, _ = native.symbolic_fill(s, d, n, pf)
    fe, _ = native.symbolic_fill(
        s, d, n, native.order(s, d, n, native.METHOD_MIN_DEGREE))
    assert ff <= fe * 1.05


def test_col_order_fast_matches_contract():
    rng = np.random.default_rng(1)
    nrow, ncol, nnz = 300, 200, 2400
    r = rng.integers(0, nrow, nnz).astype(np.int32)
    c = rng.integers(0, ncol, nnz).astype(np.int32)
    pf = native.col_order_fast(r, c, nrow, ncol)
    assert sorted(pf.tolist()) == list(range(ncol))


def test_order_fast_dense_postponement():
    """A star hub (degree n-1) must be eliminated last — postponed as a
    dense variable, like the reference amd.c's dense-row handling."""
    n = 600
    spokes = np.arange(1, n, dtype=np.int32)
    s = np.concatenate([np.zeros(n - 1, np.int32), spokes[:-1]])
    d = np.concatenate([spokes, spokes[1:]])
    p = native.order_fast(s, d, n)
    assert sorted(p.tolist()) == list(range(n))
    assert p[-1] == 0


def _python_ata_edges(rows, cols, m, n):
    """The pure-Python `_ata_graph` semantics as an edge SET (dense rows
    capped at max(16, 10*sqrt(n)); every kept row a clique, no self loops)."""
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    rdeg = np.bincount(rows, minlength=m)
    cap = max(16, int(10 * np.sqrt(max(n, 1))))
    edges = set()
    by_row = {}
    for r, c in zip(rows.tolist(), cols.tolist()):
        by_row.setdefault(r, set()).add(c)
    for r, cs in by_row.items():
        if rdeg[r] > cap:
            continue
        cs = sorted(cs)
        for a in cs:
            for b in cs:
                if a != b:
                    edges.add((a, b))
    return edges


@pytest.mark.parametrize("seed", [0, 1])
def test_ata_graph_matches_python(seed):
    rng = np.random.default_rng(seed)
    m, n, e = 30, 25, 140
    rows = rng.integers(0, m, e).astype(np.int32)
    cols = rng.integers(0, n, e).astype(np.int32)
    s, d = native.ata_graph(rows, cols, m, n)
    got = set(zip(s.tolist(), d.tolist()))
    want = _python_ata_edges(rows, cols, m, n)
    assert got == want
    # no duplicates in the native output
    assert len(got) == len(s)


def test_ata_graph_dense_row_cap():
    # one row wider than the explicit cut contributes nothing
    rows = np.concatenate([np.zeros(6, np.int32), np.array([1, 1], np.int32)])
    cols = np.concatenate([np.arange(6, dtype=np.int32),
                           np.array([7, 8], np.int32)])
    s, d = native.ata_graph(rows, cols, 2, 9, row_cut=4)
    got = set(zip(s.tolist(), d.tolist()))
    assert got == {(7, 8), (8, 7)}


def test_analyze_best_picks_min_flops():
    import scipy.sparse as sp

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu import sparseqr

    rng = np.random.default_rng(3)
    n = 60
    A = sp.random(n, n, density=0.08, random_state=7, format="csc")
    A = A + sp.eye(n, format="csc")
    best = sparseqr.analyze_best(A)
    syms = [sparseqr.analyze(sp.csc_matrix(A), k) for k in range(4)]
    assert best.flops == min(s.flops for s in syms)
    serial = sparseqr.analyze_best(A, threads=False)
    assert serial.flops == best.flops
