"""Round-2 utils surface completion — reference ``test/utils`` patterns for
the previously missing names (sparse/convert/grid/laplacian/cut/split/
isolated/segregate/sampling/IoU/tree_decomposition)."""
import numpy as np
import pytest

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.graph import (
    from_edge_index,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.utils import (
    batched_negative_sampling,
    contains_isolated_nodes,
    dense_to_sparse,
    from_networkx,
    from_scipy_sparse_matrix,
    geodesic_distance,
    get_laplacian,
    grid,
    homophily_ratio,
    mean_iou,
    normalized_cut,
    remove_isolated_nodes,
    segregate_self_loops,
    sort_edge_index,
    structured_negative_sampling,
    subgraph,
    to_networkx,
    to_scipy_sparse_matrix,
    train_test_split_edges,
    tree_decomposition,
)


def test_dense_to_sparse_roundtrip():
    adj = np.asarray([[0.0, 2.0], [3.0, 0.0]])
    ei, val = dense_to_sparse(adj)
    np.testing.assert_array_equal(ei, [[0, 1], [1, 0]])
    np.testing.assert_allclose(val, [2.0, 3.0])
    A = to_scipy_sparse_matrix(ei[0], ei[1], val, num_nodes=2)
    np.testing.assert_allclose(A.toarray(), adj)
    ei2, val2 = from_scipy_sparse_matrix(A)
    np.testing.assert_array_equal(np.sort(val2), [2.0, 3.0])


def test_networkx_roundtrip():
    x = np.arange(6, dtype=np.float32).reshape(3, 2)
    g = from_edge_index(x, np.asarray([[0, 1, 1, 2], [1, 0, 2, 1]]))
    G = to_networkx(g)
    assert G.number_of_nodes() == 3 and G.number_of_edges() == 4
    g2 = from_networkx(G)
    assert int(g2.n_node[0]) == 3
    np.testing.assert_allclose(np.asarray(g2.nodes), x)


def test_grid_matches_reference_shape():
    # 8-connected 3x3 grid incl. self-loops: 9 + 4*4 + 4*5(edges... ) --
    # just assert structural invariants the reference guarantees
    ei, pos = grid(3, 3)
    assert pos.shape == (9, 2)
    assert np.all(ei[0] >= 0) and np.all(ei[1] < 9)
    # center node (1,1) = id 4 touches all 9 incl. itself
    assert sorted(ei[1][ei[0] == 4].tolist()) == list(range(9))
    # corner 0 touches {0,1,3,4}
    assert sorted(ei[1][ei[0] == 0].tolist()) == [0, 1, 3, 4]
    # y grows upward: node 0 is top-left
    np.testing.assert_allclose(pos[0], [0, 2])


def test_get_laplacian_sym_dense_parity():
    s = np.asarray([0, 1, 1, 2])
    r = np.asarray([1, 0, 2, 1])
    w = np.asarray([1.0, 1.0, 2.0, 2.0])
    ls, lr, lw = (np.asarray(a) for a in get_laplacian(s, r, w, "sym", num_nodes=3))
    L = np.zeros((3, 3))
    np.add.at(L, (lr, ls), lw)  # receiver-row convention
    A = np.zeros((3, 3)); np.add.at(A, (r, s), w)
    d = A.sum(1)
    expect = np.eye(3) - (A / np.sqrt(d)[:, None]) / np.sqrt(d)[None, :]
    np.testing.assert_allclose(L, expect, atol=1e-6)


def test_normalized_cut():
    s = np.asarray([0, 1]); r = np.asarray([1, 0])
    cut = np.asarray(normalized_cut(s, r, np.asarray([3.0, 3.0]), num_nodes=2))
    np.testing.assert_allclose(cut, [6.0, 6.0])  # deg=1 each: 3*(1+1)


def test_homophily_ratio():
    y = np.asarray([0, 0, 1])
    assert homophily_ratio([0, 1, 2], [1, 0, 0], y) == pytest.approx(2 / 3)


def test_segregate_and_isolated():
    ei = np.asarray([[0, 1, 2], [1, 0, 2]])
    kept, _, loops, _ = segregate_self_loops(ei)
    assert kept.shape[1] == 2 and loops.shape[1] == 1
    assert contains_isolated_nodes(ei[0], ei[1], 4)  # node 2 only self-loop
    s2, r2, _, mask = remove_isolated_nodes(ei[0][:2], ei[1][:2], 3)
    assert mask.tolist() == [True, True, False]


def test_remove_isolated_drops_their_self_loops():
    # node 2 is isolated (only a self-loop): its edge must be dropped, not
    # relabeled onto node 1 (reference isolated.py filters by edge mask)
    s = np.asarray([0, 1, 2])
    r = np.asarray([1, 0, 2])
    ea = np.asarray([[10.0], [20.0], [30.0]])
    s2, r2, ea2, mask = remove_isolated_nodes(s, r, 3, edge_attr=ea)
    assert mask.tolist() == [True, True, False]
    assert set(zip(s2.tolist(), r2.tolist())) == {(0, 1), (1, 0)}
    np.testing.assert_allclose(ea2.reshape(-1), [10.0, 20.0])


def test_subgraph_reference_name():
    s = np.asarray([0, 1, 1, 2, 2, 3])
    r = np.asarray([1, 0, 2, 1, 3, 2])
    ss, rr, _, emask = subgraph([1, 2], s, r, num_nodes=4, relabel_nodes=True)
    assert emask.sum() == 2
    assert set(zip(ss.tolist(), rr.tolist())) == {(0, 1), (1, 0)}


def test_sort_edge_index_row_major():
    ei = np.asarray([[2, 0, 1, 0], [0, 2, 1, 1]])
    out, _ = sort_edge_index(ei)
    np.testing.assert_array_equal(out, [[0, 0, 1, 2], [1, 2, 1, 0]])


def test_structured_negative_sampling_avoids_positives():
    s = np.asarray([0, 0, 1, 2]); r = np.asarray([1, 2, 0, 1])
    i, j, k = structured_negative_sampling(s, r, 6, seed=1)
    pos = set(zip(s.tolist(), r.tolist()))
    for a, c in zip(i.tolist(), k.tolist()):
        assert (a, c) not in pos


def test_batched_negative_sampling_stays_in_graph():
    # two graphs of 4 nodes each
    s = np.asarray([0, 1, 4, 5]); r = np.asarray([1, 0, 5, 4])
    gid = np.repeat([0, 1], 4)
    ns, nr = batched_negative_sampling(s, r, gid, seed=0)
    assert np.all(gid[ns] == gid[nr])


def test_train_test_split_edges_partition():
    rng = np.random.default_rng(0)
    n = 30
    s, rr = np.triu_indices(n, 1)
    keep = rng.random(len(s)) < 0.3
    s, rr = s[keep], rr[keep]
    g = from_edge_index(
        np.zeros((n, 1), np.float32),
        np.stack([np.concatenate([s, rr]), np.concatenate([rr, s])]),
    )
    split = train_test_split_edges(g, val_ratio=0.1, test_ratio=0.2, seed=0)
    e = len(s)
    n_v, n_t = int(0.1 * e), int(0.2 * e)
    assert split.val_pos_edge_index.shape[1] == n_v
    assert split.test_pos_edge_index.shape[1] == n_t
    assert split.train_pos_edge_index.shape[1] == 2 * (e - n_v - n_t)
    # negatives are real non-edges
    pos = set(zip(s.tolist(), rr.tolist()))
    for a, b in split.test_neg_edge_index.T.tolist():
        assert (a, b) not in pos and (b, a) not in pos


def test_mean_iou_perfect_and_disjoint():
    assert float(mean_iou(np.asarray([0, 1]), np.asarray([0, 1]), 2)) == 1.0
    v = float(mean_iou(np.asarray([0, 0]), np.asarray([1, 1]), 2))
    assert v == 0.0


def test_geodesic_distance_unit_square():
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], float)
    face = np.asarray([[0, 0], [1, 2], [2, 3]])
    d = geodesic_distance(pos, face, src=[0], norm=False)
    np.testing.assert_allclose(d[0, 1], 1.0)
    np.testing.assert_allclose(d[0, 2], np.sqrt(2), rtol=1e-6)


def test_tree_decomposition_two_rings_sharing_bond():
    # naphthalene-like: two 4-rings sharing an edge (2-3)
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (2, 4), (4, 5), (5, 3)]
    s = np.asarray([a for a, b in edges] + [b for a, b in edges])
    r = np.asarray([b for a, b in edges] + [a for a, b in edges])
    tei, a2c, nc = tree_decomposition(s, r, 6)
    assert nc == 2                      # two ring cliques (share 2 atoms)
    assert tei.shape[1] == 2            # one junction edge, both directions
    # every atom maps to >=1 clique
    assert set(a2c[0].tolist()) == set(range(6))


def test_tree_decomposition_bridged_merge():
    # two triangles sharing an edge AND a third atom (bridged, >2 shared)
    edges = [(0, 1), (1, 2), (2, 0), (0, 3), (3, 1)]
    s = np.asarray([a for a, b in edges] + [b for a, b in edges])
    r = np.asarray([b for a, b in edges] + [a for a, b in edges])
    tei, a2c, nc, vocab = tree_decomposition(s, r, 4, return_vocab=True)
    assert nc >= 1 and (vocab <= 3).all()
