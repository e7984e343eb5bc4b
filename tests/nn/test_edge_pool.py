"""EdgePooling parity test: device-side dominant-edge matching must equal
the reference's sequential greedy scan (``nn/pool/edge_pool.py:118-166``),
up to the documented graph-major cluster reordering."""
import jax
import jax.numpy as jnp
import numpy as np

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu import data as D
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.pool.edge_pool import (
    EdgePooling,
)


def _ref_edge_pool(x, senders, receivers, lin_w, lin_b, add=0.5):
    """NumPy replica of the reference forward (softmax scoring, greedy
    contraction, summed features x score)."""
    n = x.shape[0]
    raw = (
        np.concatenate([x[senders], x[receivers]], axis=-1) @ lin_w[:, 0] + lin_b[0]
    )
    # softmax over incoming edges per receiver
    score = np.zeros_like(raw)
    for v in range(n):
        idx = np.where(receivers == v)[0]
        if len(idx):
            e = np.exp(raw[idx] - raw[idx].max())
            score[idx] = e / e.sum()
    score = score + add
    # sequential greedy scan in descending score order (stable)
    order = np.argsort(-score, kind="stable")
    remaining = set(range(n))
    clusters = []  # list of (member set, score)
    for e in order:
        s, r = int(senders[e]), int(receivers[e])
        if s not in remaining or r not in remaining:
            continue
        clusters.append((frozenset({s, r}), score[e]))
        remaining.discard(s)
        remaining.discard(r)
    for v in sorted(remaining):
        clusters.append((frozenset({v}), 1.0))
    feats = {m: x[list(m)].sum(0) * sc for m, sc in clusters}
    scores = {m: sc for m, sc in clusters}
    return feats, scores


def test_edge_pool_matches_sequential_greedy(rng):
    n, c = 10, 8
    ei = np.array(
        [
            [0, 1, 1, 2, 3, 3, 4, 5, 6, 6, 7, 8, 9, 0, 2, 5],
            [1, 0, 2, 3, 2, 4, 5, 4, 7, 8, 6, 9, 8, 3, 6, 9],
        ]
    )
    x = rng.normal(size=(n, c)).astype(np.float32)
    g = D.from_edge_index(x, ei)
    p = D.pad_graph(D.batch_graphs([g]), num_nodes=16, num_edges=24, num_graphs=2)
    p = jax.tree_util.tree_map(jnp.asarray, p)

    pool = EdgePooling(c)
    variables = pool.init(jax.random.PRNGKey(7), p)
    lin_w = np.asarray(variables["params"]["lin"])
    lin_b = np.asarray(variables["params"]["lin_bias"])
    out = pool.apply(variables, p)

    ref_feats, ref_scores = _ref_edge_pool(x, ei[0], ei[1], lin_w, lin_b)

    k = int(out.graph.n_node[0])
    assert k == len(ref_feats)
    cluster = np.asarray(out.unpool_info.cluster)
    members = {}
    for v in range(n):
        members.setdefault(int(cluster[v]), set()).add(v)
    got_nodes = np.asarray(out.graph.nodes)
    got_scores = np.asarray(out.unpool_info.new_edge_score)
    ref_edge_set = set()
    inv = {}
    for cid, mem in members.items():
        mem = frozenset(mem)
        inv[cid] = mem
        assert mem in ref_feats, f"cluster {mem} not produced by reference greedy"
        np.testing.assert_allclose(got_nodes[cid], ref_feats[mem], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(got_scores[cid], ref_scores[mem], rtol=1e-5)
    # coarsened edges = relabeled originals, coalesced
    for s, r in zip(ei[0], ei[1]):
        ref_edge_set.add((int(cluster[s]), int(cluster[r])))
    ne = int(out.graph.n_edge[0])
    got_edges = set(
        zip(
            np.asarray(out.graph.senders[:ne]).tolist(),
            np.asarray(out.graph.receivers[:ne]).tolist(),
        )
    )
    assert got_edges == ref_edge_set
    assert ne == len(ref_edge_set)


def test_edge_pool_unpool_roundtrip(rng):
    n, c = 6, 4
    ei = np.array([[0, 1, 2, 3, 4, 5], [1, 2, 3, 4, 5, 0]])
    x = rng.normal(size=(n, c)).astype(np.float32)
    g = D.from_edge_index(x, ei)
    p = D.pad_graph(D.batch_graphs([g]), num_nodes=8, num_edges=8, num_graphs=2)
    p = jax.tree_util.tree_map(jnp.asarray, p)
    pool = EdgePooling(c)
    variables = pool.init(jax.random.PRNGKey(0), p)
    out = pool.apply(variables, p)
    un = EdgePooling.unpool(out.graph.nodes, out.unpool_info)
    # unpool(x_pooled) recovers the pre-scaling cluster sums per node
    cluster = np.asarray(out.unpool_info.cluster)
    sums = np.zeros((int(out.graph.num_nodes), c), np.float32)
    np.add.at(sums, cluster[:n], x[:n])
    np.testing.assert_allclose(np.asarray(un[:n]), sums[cluster[:n]], rtol=1e-4)


def test_edge_pool_jit_and_batch(rng):
    g1 = D.from_edge_index(
        rng.normal(size=(4, 8)).astype(np.float32),
        np.array([[0, 1, 2, 3], [1, 2, 3, 0]]),
    )
    g2 = D.from_edge_index(
        rng.normal(size=(5, 8)).astype(np.float32),
        np.array([[0, 0, 1, 2, 3], [1, 4, 2, 3, 4]]),
    )
    p = D.pad_graph(D.batch_graphs([g1, g2]), num_nodes=16, num_edges=16, num_graphs=3)
    p = jax.tree_util.tree_map(jnp.asarray, p)
    pool = EdgePooling(8)
    variables = pool.init(jax.random.PRNGKey(1), p)
    out = jax.jit(lambda v, g: pool.apply(v, g))(variables, p)
    nn0, nn1 = int(out.graph.n_node[0]), int(out.graph.n_node[1])
    assert 2 <= nn0 <= 4 and 3 <= nn1 <= 5
    # clusters never span graphs
    cluster = np.asarray(out.unpool_info.cluster)
    assert set(cluster[:4].tolist()).isdisjoint(set(cluster[4:9].tolist()))
