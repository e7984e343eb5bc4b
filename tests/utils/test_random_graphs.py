import numpy as np
import jax
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.utils import (
    barabasi_albert_graph,
    dropout_adj,
    erdos_renyi_graph,
    negative_sampling,
    stochastic_blockmodel_graph,
    to_dense_adj,
)


def test_negative_sampling_avoids_edges(rng):
    s = np.asarray([0, 1, 2], np.int32)
    r = np.asarray([1, 2, 0], np.int32)
    ns, nr = negative_sampling(s, r, 10, 20)
    assert len(ns) == 20
    pos = set(zip(s.tolist(), r.tolist()))
    for a, b in zip(ns, nr):
        assert (a, b) not in pos and a != b


def test_generators_shapes():
    s, r = erdos_renyi_graph(30, 0.2, seed=1)
    assert len(s) == len(r) and len(s) > 0
    assert (s != r).all()
    s, r = barabasi_albert_graph(50, 3, seed=1)
    assert len(s) == len(r)
    deg = np.bincount(np.concatenate([s]), minlength=50)
    assert deg.max() > deg[deg > 0].min()  # hubs exist
    s, r = stochastic_blockmodel_graph([10, 10], [[0.5, 0.01], [0.01, 0.5]], seed=1)
    intra = (s < 10) == (r < 10)
    assert intra.mean() > 0.8


def test_to_dense_adj_single_and_batched(rng):
    s = jnp.asarray([0, 1, 2, 4], jnp.int32)
    r = jnp.asarray([1, 0, 3, 5], jnp.int32)
    adj = to_dense_adj(s, r, num_nodes=6)
    assert adj.shape == (1, 6, 6)
    assert float(adj[0, 1, 0]) == 1 and float(adj[0, 3, 2]) == 1
    gids = jnp.asarray([0, 0, 0, 0, 1, 1], jnp.int32)
    offs = jnp.asarray([0, 4], jnp.int32)
    adj = to_dense_adj(s, r, gids, 2, 4, node_offsets=offs)
    assert adj.shape == (2, 4, 4)
    assert float(adj[1, 1, 0]) == 1  # edge (4->5) local (0->1)


def test_dropout_adj(rng):
    s = jnp.arange(1000, dtype=jnp.int32)
    keep = dropout_adj(jax.random.key(0), s, s, p=0.3)
    frac = float(jnp.mean(keep))
    assert 0.6 < frac < 0.8
