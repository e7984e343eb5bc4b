"""Cluster-coarsening pooling — reference ``torch_geometric/nn/pool/
{graclus,avg_pool,max_pool}.py`` (torch-cluster's C++ graclus kernel role).

``greedy_matching`` (host-side) pairs each node with an unmatched neighbor —
the graclus heavy-edge-matching heuristic; ``pool_graph`` coarsens features
and relabels edges on device with segment ops.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ...data.graph import Graph
from ...ops.segment import aggregate as _aggregate


def greedy_matching(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    *,
    edge_weight: Optional[np.ndarray] = None,
    seed: int = 0,
) -> np.ndarray:
    """[N] cluster ids (consecutive) from randomized greedy edge matching."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(senders))
    if edge_weight is not None:
        order = order[np.argsort(-np.asarray(edge_weight)[order], kind="stable")]
    match = np.full(num_nodes, -1, np.int64)
    for e in order:
        a, b = int(senders[e]), int(receivers[e])
        if a != b and match[a] == -1 and match[b] == -1:
            match[a] = b
            match[b] = a
    cluster = np.full(num_nodes, -1, np.int64)
    nxt = 0
    for v in range(num_nodes):
        if cluster[v] >= 0:
            continue
        cluster[v] = nxt
        if match[v] >= 0:
            cluster[match[v]] = nxt
        nxt += 1
    return cluster


def pool_graph(
    cluster: np.ndarray,
    g: Graph,
    *,
    aggr: str = "mean",
    num_clusters: Optional[int] = None,
) -> Graph:
    """Coarsen ``g`` by cluster assignment (reference ``avg_pool``/
    ``max_pool``): node features aggregated per cluster, edges relabeled and
    kept (including merged duplicates; self-edges dropped)."""
    cluster = np.asarray(cluster)
    c = int(num_clusters) if num_clusters is not None else int(cluster.max()) + 1
    x = _aggregate(
        aggr, jnp.asarray(g.nodes), jnp.asarray(cluster.astype(np.int32)), c
    )
    s = cluster[np.asarray(g.senders)]
    r = cluster[np.asarray(g.receivers)]
    keep = s != r
    s, r = s[keep].astype(np.int32), r[keep].astype(np.int32)
    # coalesce duplicates
    key = np.unique(s.astype(np.int64) * c + r)
    s = (key // c).astype(np.int32)
    r = (key % c).astype(np.int32)
    return Graph(
        nodes=np.asarray(x),
        senders=s,
        receivers=r,
        n_node=np.asarray([c], np.int32),
        n_edge=np.asarray([len(s)], np.int32),
        globals=g.globals,
        y=g.y if (g.y is None or np.asarray(g.y).shape[0] != np.asarray(g.nodes).shape[0]) else None,
    )


def graclus_pool(g: Graph, *, aggr: str = "mean", seed: int = 0) -> Tuple[Graph, np.ndarray]:
    """One graclus coarsening level: matching + pooling."""
    n = int(np.sum(g.n_node))
    cluster = greedy_matching(
        np.asarray(g.senders), np.asarray(g.receivers), n,
        edge_weight=None if g.edges is None else np.asarray(g.edges).reshape(len(np.asarray(g.senders)), -1)[:, 0],
        seed=seed,
    )
    return pool_graph(cluster, g, aggr=aggr), cluster


def _consecutive(cluster: np.ndarray) -> np.ndarray:
    _, out = np.unique(np.asarray(cluster), return_inverse=True)
    return out


def avg_pool(cluster, g: Graph) -> Graph:
    """reference ``nn/pool/avg_pool.py`` — coarsen by cluster, mean features."""
    return pool_graph(_consecutive(cluster), g, aggr="mean")


def max_pool(cluster, g: Graph) -> Graph:
    """reference ``nn/pool/max_pool.py`` — coarsen by cluster, max features."""
    return pool_graph(_consecutive(cluster), g, aggr="max")


def avg_pool_x(cluster, x, graph_ids=None, *, num_clusters=None):
    """reference ``avg_pool_x`` — pool FEATURES only; returns (x', batch')."""
    import jax.numpy as jnp

    cl = _consecutive(cluster)
    c = int(cl.max()) + 1 if num_clusters is None else int(num_clusters)
    from ...ops.segment import segment_mean

    out = segment_mean(jnp.asarray(x), jnp.asarray(cl.astype(np.int32)), c)
    if graph_ids is None:
        return out, None
    gb = np.zeros(c, np.int64)
    gb[cl] = np.asarray(graph_ids)
    return out, jnp.asarray(gb)


def max_pool_x(cluster, x, graph_ids=None, *, num_clusters=None):
    """reference ``max_pool_x`` — pool FEATURES only; returns (x', batch')."""
    import jax.numpy as jnp

    cl = _consecutive(cluster)
    c = int(cl.max()) + 1 if num_clusters is None else int(num_clusters)
    from ...ops.segment import segment_max

    out = segment_max(jnp.asarray(x), jnp.asarray(cl.astype(np.int32)), c)
    if graph_ids is None:
        return out, None
    gb = np.zeros(c, np.int64)
    gb[cl] = np.asarray(graph_ids)
    return out, jnp.asarray(gb)


def _pool_neighbor_x(g: Graph, aggr: str) -> Graph:
    import jax.numpy as jnp

    import jax.ops

    from ...ops.segment import segment_max

    n = int(np.sum(g.n_node))
    x = jnp.asarray(g.nodes)
    s = jnp.asarray(np.asarray(g.senders))
    r = jnp.asarray(np.asarray(g.receivers))
    if aggr == "mean":
        # reference avg_pool.py adds a self-loop and takes ONE mean:
        # (sum_neighbors + x) / (deg + 1)
        total = jax.ops.segment_sum(x[s], r, num_segments=n) + x
        deg = jax.ops.segment_sum(jnp.ones_like(s, x.dtype), r,
                                  num_segments=n) + 1.0
        out = total / deg[:, None]
    else:
        out = jnp.maximum(segment_max(x[s], r, n), x)
    return g.replace(nodes=np.asarray(out))


def avg_pool_neighbor_x(g: Graph) -> Graph:
    """reference ``avg_pool.py:avg_pool_neighbor_x`` — average each node
    with its neighborhood (no coarsening)."""
    return _pool_neighbor_x(g, "mean")


def max_pool_neighbor_x(g: Graph) -> Graph:
    """reference ``max_pool.py:max_pool_neighbor_x``."""
    return _pool_neighbor_x(g, "max")
