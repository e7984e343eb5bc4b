"""Reverse Cuthill–McKee relabeling — bandwidth reduction for the BSR path.

Matrix-structure graphs (the framework's domain) usually ship with whatever
row order the matrix came in; RCM relabels nodes so neighbors get nearby
ids, concentrating edges near the diagonal.  That is what makes the BSR MXU
kernel (``ops/bsr.py``) effective: post-RCM, most edges land in a few dense
128x128 blocks per block-row.  This is the same preprocessing role the
reference delegates to its fill-reducing orderings (``amd.c``, METIS) before
factorization — here applied to the *aggregation* operator layout instead.

Host-side numpy (one-time per graph, like ``ToSparseTensor`` in the
reference's pipeline, ``torch_geometric/transforms/to_sparse_tensor.py``).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _csr(senders: np.ndarray, receivers: np.ndarray, n: int):
    """Symmetrized CSR adjacency (undirected view for the BFS)."""
    s = np.concatenate([senders, receivers])
    r = np.concatenate([receivers, senders])
    order = np.lexsort((r, s))
    s, r = s[order], r[order]
    # dedupe
    keep = np.ones(len(s), bool)
    keep[1:] = (s[1:] != s[:-1]) | (r[1:] != r[:-1])
    s, r = s[keep], r[keep]
    deg = np.bincount(s, minlength=n)
    ptr = np.concatenate([[0], np.cumsum(deg)])
    return ptr, r, deg


def rcm_order(
    senders: np.ndarray, receivers: np.ndarray, num_nodes: int
) -> np.ndarray:
    """Return ``order`` (old ids in new sequence): ``order[k]`` is the old id
    of new node ``k``.  Inverse (``rank``) = ``np.argsort(order)``."""
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    n = int(num_nodes)
    ptr, adj, deg = _csr(senders, receivers, n)

    visited = np.zeros(n, bool)
    order = np.empty(n, np.int64)
    pos = 0

    # process components from lowest-degree unvisited seeds (the classic
    # pseudo-peripheral heuristic, one extra BFS to deepen the start)
    seeds = np.argsort(deg, kind="stable")
    for seed in seeds:
        if visited[seed]:
            continue
        start = _pseudo_peripheral(int(seed), ptr, adj, deg, visited)
        pos = _bfs_cm(start, ptr, adj, deg, visited, order, pos)
    assert pos == n
    return order[::-1].copy()  # reverse = RCM


def _pseudo_peripheral(seed: int, ptr, adj, deg, visited) -> int:
    """Double-BFS: the farthest min-degree node from the seed."""
    cur = seed
    for _ in range(2):
        level = _bfs_levels(cur, ptr, adj, visited)
        last = level[-1]
        cur = int(last[np.argmin(deg[last])])
    return cur


def _bfs_levels(start: int, ptr, adj, visited):
    seen = visited.copy()
    seen[start] = True
    levels = [np.array([start], np.int64)]
    while True:
        frontier = levels[-1]
        nxt = []
        for u in frontier:
            nbrs = adj[ptr[u] : ptr[u + 1]]
            fresh = nbrs[~seen[nbrs]]
            seen[fresh] = True
            nxt.append(fresh)
        nxt = np.concatenate(nxt) if nxt else np.array([], np.int64)
        if len(nxt) == 0:
            return levels
        levels.append(np.unique(nxt))


def _bfs_cm(start: int, ptr, adj, deg, visited, order, pos: int) -> int:
    """Cuthill–McKee BFS: visit neighbors in increasing-degree order."""
    from collections import deque

    q = deque([start])
    visited[start] = True
    while q:
        u = q.popleft()
        order[pos] = u
        pos += 1
        nbrs = adj[ptr[u] : ptr[u + 1]]
        fresh = nbrs[~visited[nbrs]]
        if len(fresh):
            fresh = fresh[np.argsort(deg[fresh], kind="stable")]
            visited[fresh] = True
            q.extend(fresh.tolist())
    return pos


def relabel_coo(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    order: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Apply an ordering to a COO edge list.

    Returns ``(new_senders, new_receivers, order)``; node features must be
    permuted as ``x_new = x[order]`` and outputs mapped back with
    ``out_old = out_new[rank]`` where ``rank = np.argsort(order)``.
    """
    if order is None:
        order = rcm_order(senders, receivers, num_nodes)
    rank = np.argsort(order)
    return rank[senders].astype(np.int32), rank[receivers].astype(np.int32), order


def bandwidth(senders: np.ndarray, receivers: np.ndarray) -> int:
    """Max |s - r| over edges — the quantity RCM minimizes."""
    if len(senders) == 0:
        return 0
    return int(np.max(np.abs(np.asarray(senders, np.int64) - np.asarray(receivers, np.int64))))
