"""Transform tests — mirroring ``test/transforms/`` of the reference."""
import numpy as np
import pytest

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.graph import from_edge_index
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.transforms import (
    AddSelfLoops,
    Compose,
    Distance,
    GCNNorm,
    KNNGraph,
    LocalDegreeProfile,
    NormalizeFeatures,
    OneHotDegree,
    RemoveSelfLoops,
    ToUndirected,
    TwoHop,
)


def _g():
    x = np.asarray([[1.0, 3.0], [2.0, 2.0], [0.0, 0.0], [4.0, 4.0]], np.float32)
    ei = np.asarray([[0, 1, 1, 2], [1, 0, 2, 3]])
    w = np.asarray([1.0, 2.0, 3.0, 4.0], np.float32)
    return from_edge_index(x, ei, edge_attr=w)


def test_add_remove_self_loops():
    g = AddSelfLoops()(_g())
    assert int(g.n_edge[0]) == 8
    assert np.sum(np.asarray(g.senders) == np.asarray(g.receivers)) == 4
    g2 = RemoveSelfLoops()(g)
    assert int(g2.n_edge[0]) == 4


def test_normalize_features():
    g = NormalizeFeatures()(_g())
    s = np.asarray(g.nodes).sum(axis=1)
    np.testing.assert_allclose(s[[0, 1, 3]], 1.0, rtol=1e-6)
    assert s[2] == 0  # all-zero row left untouched


def test_to_undirected_coalesce():
    g = ToUndirected()(_g())
    s, r = np.asarray(g.senders), np.asarray(g.receivers)
    pairs = set(zip(s.tolist(), r.tolist()))
    assert (1, 0) in pairs and (0, 1) in pairs and (3, 2) in pairs
    # duplicate (0,1)+(1,0)-reversed coalesce to weight 1+2=3
    w = np.asarray(g.edges)
    idx = [i for i, p in enumerate(zip(s, r)) if p == (0, 1)][0]
    assert w[idx] == 3.0


def test_gcn_norm_weights_sum():
    g = GCNNorm()(_g())
    assert int(g.n_edge[0]) == 8  # 4 + self loops
    assert np.all(np.asarray(g.edges) > 0)


def test_two_hop():
    pytest.importorskip("scipy")
    g = TwoHop()(_g())
    s, r = np.asarray(g.senders), np.asarray(g.receivers)
    pairs = set(zip(s.tolist(), r.tolist()))
    assert (1, 3) in pairs  # 1->2->3
    assert (0, 2) in pairs  # 0->1->2


def test_knn_graph_and_distance():
    g = KNNGraph(k=2)(_g().replace(edges=None, n_edge=np.asarray([0], np.int32),
                                   senders=np.zeros(0, np.int32),
                                   receivers=np.zeros(0, np.int32)))
    assert int(g.n_edge[0]) == 8  # 4 nodes * k=2
    g = Distance(cat=False)(g)
    assert np.asarray(g.edges).shape == (8, 1)
    assert np.asarray(g.edges).max() <= 1.0


def test_degree_profiles():
    g = LocalDegreeProfile()(_g())
    assert np.asarray(g.nodes).shape == (4, 7)
    g2 = OneHotDegree(3, cat=False)(_g())
    assert np.asarray(g2.nodes).shape == (4, 4)
    deg = np.asarray(g2.nodes).argmax(axis=1)
    np.testing.assert_array_equal(deg, [1, 1, 1, 1])


def test_compose():
    t = Compose([AddSelfLoops(), NormalizeFeatures()])
    g = t(_g())
    assert int(g.n_edge[0]) == 8
    np.testing.assert_allclose(np.asarray(g.nodes)[0].sum(), 1.0, rtol=1e-6)


def test_gdc_ppr_and_heat():
    pytest.importorskip("scipy")
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.transforms import GDC

    g = _g()
    for method in ("ppr", "heat"):
        out = GDC(method=method, sparsify="threshold", eps=1e-3)(g)
        w = np.asarray(out.edges)
        assert (w > 0).all()
        # column-stochastic after normalization
        r = np.asarray(out.receivers)
        s = np.asarray(out.senders)
        sums = np.zeros(4)
        np.add.at(sums, s, w)
        present = np.bincount(s, minlength=4) > 0
        np.testing.assert_allclose(sums[present], 1.0, rtol=1e-5)


def test_to_slic_superpixels():
    """ToSLIC (reference to_superpixels.py) with the built-in SLIC."""
    import numpy as np
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.transforms import (
        KNNGraph, ToSLIC)

    img = np.zeros((20, 20, 3))
    img[:, 10:] = 1.0
    md = ToSLIC(n_segments=9)(img)
    assert md.pos.shape[1] == 2 and md.x.shape[1] == 3
    # mean colors split cleanly by side
    left = md.x[md.pos[:, 0] < 8]
    right = md.x[md.pos[:, 0] > 12]
    assert left.mean() < 0.2 and right.mean() > 0.8
    # CHW input accepted like the reference's torchvision tensors
    md2 = ToSLIC(n_segments=9)(np.transpose(img, (2, 0, 1)))
    assert md2.pos.shape == md.pos.shape
    g = KNNGraph(k=3)(md)
    assert int(g.n_edge[0]) == 3 * md.pos.shape[0]
