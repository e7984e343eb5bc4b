"""Batching tests — mirrors reference ``test/data/test_batch.py`` semantics
(from_data_list offsetting + reconstruction) plus padding invariants."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data import (
    Graph,
    batch_graphs,
    from_edge_index,
    pad_graph,
    pad_to_bucket,
    unbatch,
)


def make_graph(n, e, seed=0, with_y=True):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 4)).astype(np.float32)
    ei = rng.integers(0, n, size=(2, e)).astype(np.int32)
    y = np.array([seed % 4]) if with_y else None
    return from_edge_index(x, ei, y=y)


def test_batch_offsets():
    g1, g2 = make_graph(3, 5, 1), make_graph(4, 6, 2)
    b = batch_graphs([g1, g2])
    assert b.nodes.shape == (7, 4)
    assert b.senders.shape == (11,)
    np.testing.assert_array_equal(b.n_node, [3, 4])
    np.testing.assert_array_equal(b.n_edge, [5, 6])
    # graph 2's edges are offset by 3
    np.testing.assert_array_equal(b.senders[5:], np.asarray(g2.senders) + 3)
    np.testing.assert_array_equal(b.y, [1, 2])


def test_unbatch_roundtrip():
    gs = [make_graph(3, 5, 1), make_graph(4, 6, 2), make_graph(2, 3, 3)]
    back = unbatch(batch_graphs(gs))
    assert len(back) == 3
    for a, b in zip(gs, back):
        np.testing.assert_allclose(a.nodes, b.nodes)
        np.testing.assert_array_equal(a.senders, b.senders)
        np.testing.assert_array_equal(a.receivers, b.receivers)


def test_pad_and_masks():
    b = batch_graphs([make_graph(3, 5, 1), make_graph(4, 6, 2)])
    p = pad_graph(b, num_nodes=16, num_edges=32, num_graphs=4)
    assert p.nodes.shape == (16, 4)
    assert p.senders.shape == (32,)
    assert p.num_graphs == 4
    nm, em, gm = p.node_mask(), p.edge_mask(), p.graph_mask()
    assert int(jnp.sum(jnp.asarray(nm))) == 7
    assert int(jnp.sum(jnp.asarray(em))) == 11
    np.testing.assert_array_equal(np.asarray(gm), [True, True, False, False])
    # padded edges point at the padding node
    np.testing.assert_array_equal(np.asarray(p.senders[11:]), 15)
    # node→graph ids: pad nodes map to the last graph
    ids = np.asarray(Graph(*p).node_graph_ids())
    np.testing.assert_array_equal(ids[:7], [0, 0, 0, 1, 1, 1, 1])
    np.testing.assert_array_equal(ids[7:], 3)


def test_pad_unbatch_ignores_padding():
    b = batch_graphs([make_graph(3, 5, 1), make_graph(4, 6, 2)])
    p = pad_graph(b, num_nodes=16, num_edges=32, num_graphs=4)
    back = unbatch(p)
    assert len(back) == 2
    np.testing.assert_array_equal(back[1].n_node, [4])


def test_pad_requires_pad_graph_slot():
    b = batch_graphs([make_graph(3, 5, 1)])
    with pytest.raises(ValueError):
        pad_graph(b, num_nodes=8, num_edges=8, num_graphs=1)


def test_bucketing_bounded_shapes():
    shapes = set()
    for n in range(1, 400, 13):
        g = pad_to_bucket(batch_graphs([make_graph(n, 2 * n, n)]))
        shapes.add((g.num_nodes, g.num_edges))
    assert len(shapes) <= 6  # log-bounded compilation count


def test_graph_is_pytree():
    b = batch_graphs([make_graph(3, 5, 1)])
    p = pad_graph(b, num_nodes=8, num_edges=8, num_graphs=2)
    leaves = jax.tree_util.tree_leaves(p)
    assert len(leaves) >= 5
    moved = jax.tree_util.tree_map(jnp.asarray, p)
    assert isinstance(moved, Graph)
