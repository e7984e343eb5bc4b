"""Pooling tests: masked global pools and static-shape TopK
(reference ``test/nn/pool`` + ``nn/pool/topk_pool.py`` semantics)."""
import jax
import jax.numpy as jnp
import numpy as np

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data import (
    batch_graphs,
    from_edge_index,
    pad_graph,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import (
    TopKPooling,
    global_add_pool,
    global_max_pool,
    global_mean_pool,
    topk_pool,
)


def make_batch(rng):
    g1 = from_edge_index(
        rng.normal(size=(3, 4)).astype(np.float32), np.array([[0, 1], [1, 2]])
    )
    g2 = from_edge_index(
        rng.normal(size=(5, 4)).astype(np.float32),
        np.array([[0, 1, 2, 3], [1, 2, 3, 4]]),
    )
    b = batch_graphs([g1, g2])
    p = pad_graph(b, num_nodes=16, num_edges=8, num_graphs=3)
    return b, jax.tree_util.tree_map(jnp.asarray, p)


def test_global_pools_ignore_padding(rng):
    b, p = make_batch(rng)
    x = np.asarray(b.nodes)
    dense_means = [x[:3].mean(0), x[3:8].mean(0)]
    dense_maxes = [x[:3].max(0), x[3:8].max(0)]
    dense_sums = [x[:3].sum(0), x[3:8].sum(0)]

    xp = jnp.asarray(p.nodes) + 100.0 * (~p.node_mask())[:, None]  # poison padding
    mean = global_mean_pool(xp, p)
    mx = global_max_pool(xp, p)
    sm = global_add_pool(jnp.asarray(p.nodes), p)
    for i in range(2):
        np.testing.assert_allclose(mean[i], dense_means[i], rtol=1e-5)
        np.testing.assert_allclose(mx[i], dense_maxes[i], rtol=1e-5)
        np.testing.assert_allclose(sm[i], dense_sums[i], rtol=1e-5)


def test_topk_pool_selects_per_graph_topk(rng):
    _, p = make_batch(rng)
    score = jnp.asarray(np.arange(16, dtype=np.float32))  # higher idx = higher score
    out = topk_pool(p, score, ratio=0.5)
    # graph 0 has 3 nodes → k=2 (ceil 1.5); graph 1 has 5 → k=3 (ceil 2.5)
    np.testing.assert_array_equal(np.asarray(out.graph.n_node)[:2], [2, 3])
    perm = np.asarray(out.perm)
    # graph 0 keeps its two highest-scored nodes: indices 2,1; graph 1: 7,6,5
    assert set(perm[:2].tolist()) == {2, 1}
    assert set(perm[2:5].tolist()) == {7, 6, 5}


def test_topk_gating_and_edges(rng):
    _, p = make_batch(rng)
    score = jnp.asarray(np.linspace(-1, 1, 16, dtype=np.float32))
    out = topk_pool(p, score, ratio=0.8)
    g = out.graph
    # kept edges connect only surviving nodes, relabeled in-range
    em = np.asarray(g.edge_mask())
    s, r = np.asarray(g.senders)[em], np.asarray(g.receivers)[em]
    n_valid = int(np.asarray(g.n_node).sum())
    assert (s < n_valid).all() and (r < n_valid).all()
    # features of kept nodes are gated by tanh(score)
    nodes = np.asarray(g.nodes)
    orig = np.asarray(p.nodes)[np.asarray(out.perm)]
    gate = np.tanh(np.asarray(out.score))[:, None]
    km = np.arange(16) < n_valid
    np.testing.assert_allclose(nodes[km], (orig * gate)[km], rtol=1e-5)


def test_topk_module(rng):
    _, p = make_batch(rng)
    mod = TopKPooling(in_channels=4, ratio=0.8)
    params = mod.init(jax.random.key(0), p)
    out = mod.apply(params, p)
    assert out.graph.nodes.shape == (16, 4)
    n_new = np.asarray(out.graph.n_node)
    np.testing.assert_array_equal(n_new[:2], [3, 4])  # ceil(0.8·3), ceil(0.8·5)
