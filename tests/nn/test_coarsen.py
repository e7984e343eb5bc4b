import numpy as np

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.graph import from_edge_index
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.pool import (
    graclus_pool,
    greedy_matching,
    pool_graph,
)


def test_matching_valid(rng):
    ei = np.stack([rng.integers(0, 30, 100), rng.integers(0, 30, 100)])
    cluster = greedy_matching(ei[0], ei[1], 30)
    assert cluster.min() == 0
    sizes = np.bincount(cluster)
    assert sizes.max() <= 2  # matching pairs at most 2 nodes


def test_pool_graph_mean(rng):
    x = np.asarray([[1.0], [3.0], [10.0]], np.float32)
    g = from_edge_index(x, np.asarray([[0, 1, 2], [1, 2, 0]]))
    pooled = pool_graph(np.asarray([0, 0, 1]), g)
    assert int(pooled.n_node[0]) == 2
    np.testing.assert_allclose(np.asarray(pooled.nodes), [[2.0], [10.0]])
    pairs = set(zip(pooled.senders.tolist(), pooled.receivers.tolist()))
    assert (0, 1) in pairs and (1, 0) in pairs  # merged cross edges, no self


def test_graclus_pool_halves(rng):
    ei = np.stack([rng.integers(0, 40, 160), rng.integers(0, 40, 160)])
    g = from_edge_index(rng.normal(size=(40, 4)).astype(np.float32), ei)
    pooled, cluster = graclus_pool(g)
    assert 20 <= int(pooled.n_node[0]) <= 40
