"""Negative sampling + random graph generators + dense adjacency utils —
reference ``torch_geometric/utils/{negative_sampling,random,to_dense_adj,
dropout}.py``."""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def negative_sampling(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    num_neg_samples: Optional[int] = None,
    *,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Sample non-edges (host-side rejection, reference
    ``negative_sampling.py``)."""
    e = len(senders)
    num_neg = e if num_neg_samples is None else num_neg_samples
    existing = set(
        (int(a) * num_nodes + int(b)) for a, b in zip(senders, receivers)
    )
    rng = np.random.default_rng(seed)
    out_s, out_r = [], []
    trials = 0
    while len(out_s) < num_neg and trials < 50 * num_neg:
        k = num_neg - len(out_s)
        cand_s = rng.integers(0, num_nodes, 2 * k)
        cand_r = rng.integers(0, num_nodes, 2 * k)
        for a, b in zip(cand_s, cand_r):
            key = int(a) * num_nodes + int(b)
            if a != b and key not in existing:
                existing.add(key)
                out_s.append(int(a))
                out_r.append(int(b))
                if len(out_s) == num_neg:
                    break
        trials += 2 * k
    return np.asarray(out_s, np.int32), np.asarray(out_r, np.int32)


def negative_sampling_on_device(
    key: jax.Array, num_nodes: int, num_samples: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fast approximate variant: uniform pairs (collisions with real edges
    are vanishingly rare on sparse graphs) — the jit-friendly choice for
    in-loop GAE training."""
    ks, kr = jax.random.split(key)
    return (
        jax.random.randint(ks, (num_samples,), 0, num_nodes),
        jax.random.randint(kr, (num_samples,), 0, num_nodes),
    )


def erdos_renyi_graph(
    num_nodes: int, edge_prob: float, *, seed: int = 0, directed: bool = False
) -> Tuple[np.ndarray, np.ndarray]:
    """reference ``utils/random.py:erdos_renyi_graph``"""
    rng = np.random.default_rng(seed)
    mask = rng.random((num_nodes, num_nodes)) < edge_prob
    np.fill_diagonal(mask, False)
    if not directed:
        mask = np.triu(mask)
    s, r = np.nonzero(mask)
    if not directed:
        s, r = np.concatenate([s, r]), np.concatenate([r, s])
    return s.astype(np.int32), r.astype(np.int32)


def barabasi_albert_graph(
    num_nodes: int, num_edges_per_node: int, *, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """reference ``utils/random.py:barabasi_albert_graph``"""
    rng = np.random.default_rng(seed)
    m = num_edges_per_node
    targets = list(range(m))
    s, r = [], []
    repeated: list = list(range(m))
    for v in range(m, num_nodes):
        for t in targets:
            s.append(v)
            r.append(t)
        repeated.extend(targets)
        repeated.extend([v] * m)
        targets = [int(repeated[i]) for i in rng.integers(0, len(repeated), m)]
    s2 = np.concatenate([s, r]).astype(np.int32)
    r2 = np.concatenate([r, s]).astype(np.int32)
    return s2, r2


def stochastic_blockmodel_graph(
    block_sizes, edge_probs, *, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Sample an SBM graph: edge ``(i, j)`` appears with prob ``edge_probs[block(i)][block(j)]`` — reference ``utils/random.py:stochastic_blockmodel_graph``."""
    rng = np.random.default_rng(seed)
    sizes = np.asarray(block_sizes)
    starts = np.concatenate([[0], np.cumsum(sizes)])
    s_all, r_all = [], []
    for i in range(len(sizes)):
        for j in range(len(sizes)):
            p = edge_probs[i][j]
            mask = rng.random((sizes[i], sizes[j])) < p
            si, ri = np.nonzero(mask)
            s_all.append(si + starts[i])
            r_all.append(ri + starts[j])
    s = np.concatenate(s_all)
    r = np.concatenate(r_all)
    keep = s != r
    return s[keep].astype(np.int32), r[keep].astype(np.int32)


def to_dense_adj(
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    graph_ids: Optional[jnp.ndarray] = None,
    num_graphs: int = 1,
    max_num_nodes: Optional[int] = None,
    *,
    node_offsets: Optional[jnp.ndarray] = None,
    edge_weight: Optional[jnp.ndarray] = None,
    edge_mask: Optional[jnp.ndarray] = None,
    num_nodes: Optional[int] = None,
) -> jnp.ndarray:
    """COO → ``[G, N_max, N_max]`` batched dense adjacency (reference
    ``utils/to_dense_adj.py``).  For a single graph pass defaults."""
    e = senders.shape[0]
    w = jnp.ones(e, jnp.float32) if edge_weight is None else edge_weight
    if edge_mask is not None:
        w = jnp.where(edge_mask, w, 0)
    if graph_ids is None:
        n = int(num_nodes) if num_nodes is not None else int(max_num_nodes)
        adj = jnp.zeros((1, n, n), w.dtype)
        return adj.at[0, receivers, senders].add(w)
    # batched: local indices via per-graph node offsets
    if node_offsets is None or max_num_nodes is None:
        raise ValueError("batched mode needs node_offsets and max_num_nodes")
    edge_gid = graph_ids[receivers]
    ls = senders - node_offsets[edge_gid]
    lr = receivers - node_offsets[edge_gid]
    adj = jnp.zeros((num_graphs, max_num_nodes, max_num_nodes), w.dtype)
    ok = (ls >= 0) & (ls < max_num_nodes) & (lr >= 0) & (lr < max_num_nodes)
    w = jnp.where(ok, w, 0)
    ls = jnp.clip(ls, 0, max_num_nodes - 1)
    lr = jnp.clip(lr, 0, max_num_nodes - 1)
    return adj.at[edge_gid, lr, ls].add(w)


def dropout_adj(
    key: jax.Array,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    p: float = 0.5,
    *,
    edge_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Randomly drop edges: returns an updated edge mask (static shapes — the
    TPU-native formulation of reference ``utils/dropout.py:dropout_adj``)."""
    keep = jax.random.bernoulli(key, 1 - p, senders.shape)
    return keep if edge_mask is None else (keep & edge_mask)


def structured_negative_sampling(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    *,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """reference ``negative_sampling.py:structured_negative_sampling`` — for
    every positive edge (i, j) sample a k with (i, k) not an edge; returns
    (i, j, k)."""
    s = np.asarray(senders).astype(np.int64)
    r = np.asarray(receivers).astype(np.int64)
    pos = set((int(a) * num_nodes + int(b)) for a, b in zip(s, r))
    rng = np.random.default_rng(seed)
    k = rng.integers(0, num_nodes, len(s))
    for t in range(len(s)):
        while int(s[t]) * num_nodes + int(k[t]) in pos:
            k[t] = rng.integers(0, num_nodes)
    return s, r, k.astype(np.int64)


def batched_negative_sampling(
    senders: np.ndarray,
    receivers: np.ndarray,
    graph_ids: np.ndarray,
    num_neg_samples: Optional[int] = None,
    *,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """reference ``negative_sampling.py:batched_negative_sampling`` — sample
    negatives per graph of a disconnected union (``graph_ids`` = the batch
    vector over nodes), negatives never cross graphs."""
    s = np.asarray(senders)
    r = np.asarray(receivers)
    gid = np.asarray(graph_ids)
    out_s, out_r = [], []
    for g in range(int(gid.max()) + 1):
        nodes = np.nonzero(gid == g)[0]
        lo, n = int(nodes.min()), len(nodes)
        emask = gid[s] == g
        ns, nr = negative_sampling(
            s[emask] - lo, r[emask] - lo, n,
            None if num_neg_samples is None else num_neg_samples,
            seed=seed + g,
        )
        out_s.append(ns + lo)
        out_r.append(nr + lo)
    return np.concatenate(out_s).astype(np.int32), np.concatenate(out_r).astype(np.int32)
