"""Sampler tests — reference ``test/data/test_sampler.py`` block-shape checks
plus on-device correctness (every sampled edge is a real graph edge)."""
import numpy as np
import jax
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data import (
    ClusterData,
    ClusterLoader,
    GraphSAINTSampler,
    NeighborSampler,
    RandomNodeSampler,
    bfs_partition,
    build_csr_table,
    sample_fanout,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.graph import from_edge_index
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.utils import (
    induced_subgraph,
    k_hop_subgraph,
)


def _random_graph(rng, n=40, e=200):
    x = rng.normal(size=(n, 4)).astype(np.float32)
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    return from_edge_index(x, ei), ei


def test_fanout_blocks_shapes_and_validity(rng):
    g, ei = _random_graph(rng)
    real_edges = set(zip(ei[0].tolist(), ei[1].tolist()))
    table = build_csr_table(ei[0], ei[1], 40)
    seeds = jnp.asarray([0, 3, 7, 11], jnp.int32)
    blocks = sample_fanout(jax.random.key(0), table, seeds, [5, 3])
    assert len(blocks) == 2
    inner = blocks[-1]  # hop-1 block (seeds as dst, fanout sizes[0]) is LAST
    assert inner.num_dst == 4
    assert inner.src_ids.shape == (4 + 4 * 5,)
    outer = blocks[0]   # furthest hop applied first (reference adjs[::-1])
    assert outer.num_dst == 4 + 4 * 5
    # every unmasked sampled edge must exist in the original graph
    for blk in blocks:
        src = np.asarray(blk.src_ids)
        s = src[np.asarray(blk.senders)]
        d = src[np.asarray(blk.receivers)]
        m = np.asarray(blk.edge_mask)
        for a, b in zip(s[m], d[m]):
            assert (a, b) in real_edges


def test_neighbor_sampler_iterates(rng):
    g, ei = _random_graph(rng)
    loader = NeighborSampler(ei[0], ei[1], 40, sizes=[4, 2], batch_size=8, shuffle=True)
    batches = list(loader)
    assert len(batches) == 5
    seeds, blocks = batches[0]
    assert seeds.shape == (8,)
    assert blocks[-1].num_dst == 8


def test_induced_subgraph_and_khop(rng):
    g, ei = _random_graph(rng, n=20, e=60)
    sub = induced_subgraph(g, np.asarray([2, 5, 9]))
    assert int(sub.n_node[0]) == 3
    s, r = np.asarray(sub.senders), np.asarray(sub.receivers)
    assert ((s >= 0) & (s < 3)).all() and ((r >= 0) & (r < 3)).all()

    subset, ss, rr, emask = k_hop_subgraph(0, 2, ei[0], ei[1], 20, relabel_nodes=True)
    assert 0 in subset
    # 1-hop in-neighbors of 0 must be included
    for a, b in zip(ei[0], ei[1]):
        if b == 0:
            assert a in subset


def test_random_node_sampler(rng):
    g, _ = _random_graph(rng)
    parts = list(RandomNodeSampler(g, num_parts=4, shuffle=True))
    assert len(parts) == 4
    assert sum(int(p.n_node[0]) for p in parts) == 40


def test_cluster_partition_and_loader(rng):
    g, ei = _random_graph(rng, n=60, e=240)
    part = bfs_partition(ei[0], ei[1], 60, 4)
    assert part.min() >= 0 and part.max() <= 3
    assert np.bincount(part).max() <= 20  # balanced-ish
    cd = ClusterData(g, 4)
    total = sum(int(cd[i].n_node[0]) for i in range(4))
    assert total == 60
    loader = ClusterLoader(cd, batch_size=2)
    batches = list(loader)
    assert len(batches) == 2
    padded, nodes = batches[0]
    assert padded.num_nodes % 128 == 0


def test_graph_saint_modes(rng):
    g, _ = _random_graph(rng)
    for mode in ("node", "edge", "walk"):
        s = GraphSAINTSampler(g, mode=mode, budget=12, num_steps=3, sample_coverage=4)
        outs = list(s)
        assert len(outs) == 3
        sub, nodes = outs[0]
        assert int(sub.n_node[0]) == len(nodes)
        assert s.node_norm.shape == (40,)
