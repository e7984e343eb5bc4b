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


def contains_isolated_nodes(senders, receivers, num_nodes: int) -> bool:
    """reference ``isolated.py:contains_isolated_nodes`` (self-loops do not
    count as connectivity)."""
    s = np.asarray(senders)
    r = np.asarray(receivers)
    keep = s != r
    touched = np.zeros(num_nodes, bool)
    touched[s[keep]] = True
    touched[r[keep]] = True
    return bool((~touched).any())


def remove_isolated_nodes(senders, receivers, num_nodes: int,
                          edge_attr=None):
    """reference ``isolated.py:remove_isolated_nodes`` — relabels the
    surviving nodes; returns (senders, receivers, edge_attr, node_mask)."""
    s = np.asarray(senders)
    r = np.asarray(receivers)
    non_loop = s != r
    mask = np.zeros(num_nodes, bool)
    mask[s[non_loop]] = True
    mask[r[non_loop]] = True
    # drop edges touching removed nodes (incl. their self-loops) and keep
    # edge_attr aligned — reference isolated.py filters both by edge mask
    keep_e = mask[s] & mask[r]
    s, r = s[keep_e], r[keep_e]
    relabel = np.cumsum(mask) - 1
    ea = None if edge_attr is None else np.asarray(edge_attr)[keep_e]
    return (relabel[s].astype(s.dtype), relabel[r].astype(r.dtype), ea, mask)


# reference name for the node-induced subgraph (``utils/subgraph.py``)
def subgraph(subset, senders, receivers, edge_attr=None, *,
             num_nodes: int, relabel_nodes: bool = False):
    """reference ``subgraph()`` — edges with BOTH endpoints in ``subset``;
    returns (senders, receivers, edge_attr, edge_mask)."""
    s = np.asarray(senders)
    r = np.asarray(receivers)
    keep = np.zeros(num_nodes, bool)
    keep[np.asarray(subset)] = True
    emask = keep[s] & keep[r]
    s, r = s[emask], r[emask]
    if relabel_nodes:
        relabel = np.full(num_nodes, -1, np.int64)
        relabel[np.asarray(subset)] = np.arange(len(np.asarray(subset)))
        s, r = relabel[s].astype(np.int32), relabel[r].astype(np.int32)
    ea = None if edge_attr is None else np.asarray(edge_attr)[emask]
    return s, r, ea, emask
