"""Subgraph extraction — reference ``torch_geometric/utils/subgraph.py``.

Host-side NumPy (input-pipeline territory: output shapes are data-dependent,
so this runs before padding, like the reference's CPU samplers).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..data.graph import Graph


def induced_subgraph(g: Graph, nodes: np.ndarray) -> Graph:
    """Node-induced subgraph with relabeled edges (reference ``subgraph()``)."""
    nodes = np.asarray(nodes)
    n = int(np.sum(g.n_node))
    keep = np.zeros(n, bool)
    keep[nodes] = True
    relabel = np.full(n, -1, np.int64)
    relabel[nodes] = np.arange(len(nodes))
    s, r = np.asarray(g.senders), np.asarray(g.receivers)
    emask = keep[s] & keep[r]
    new_s = relabel[s[emask]].astype(np.int32)
    new_r = relabel[r[emask]].astype(np.int32)
    return Graph(
        nodes=np.asarray(g.nodes)[nodes],
        senders=new_s,
        receivers=new_r,
        n_node=np.asarray([len(nodes)], np.int32),
        n_edge=np.asarray([len(new_s)], np.int32),
        edges=None if g.edges is None else np.asarray(g.edges)[emask],
        globals=g.globals,
        y=None
        if g.y is None
        else (
            np.asarray(g.y)[nodes]
            if np.asarray(g.y).shape[0] == n
            else np.asarray(g.y)
        ),
    )


def k_hop_subgraph(
    node_idx,
    num_hops: int,
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    *,
    relabel_nodes: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """reference ``utils/subgraph.py:k_hop_subgraph``: nodes reachable within
    ``num_hops`` (following edges backwards, i.e. the receptive field of
    message passing).  Returns (subset, sub_senders, sub_receivers,
    edge_mask)."""
    s = np.asarray(senders)
    r = np.asarray(receivers)
    node_idx = np.atleast_1d(np.asarray(node_idx))
    visited = np.zeros(num_nodes, bool)
    visited[node_idx] = True
    frontier = node_idx
    for _ in range(num_hops):
        on = np.zeros(num_nodes, bool)
        on[frontier] = True
        hit = on[r]
        frontier = np.unique(s[hit])
        new = frontier[~visited[frontier]]
        visited[new] = True
        if len(new) == 0:
            break
    subset = np.nonzero(visited)[0]
    emask = visited[s] & visited[r]
    sub_s, sub_r = s[emask], r[emask]
    if relabel_nodes:
        relabel = np.full(num_nodes, -1, np.int64)
        relabel[subset] = np.arange(len(subset))
        sub_s, sub_r = relabel[sub_s], relabel[sub_r]
    return subset, sub_s.astype(np.int32), sub_r.astype(np.int32), emask
