"""Interop + graph-structure helpers — reference ``torch_geometric/utils/``
(``convert.py``, ``sparse.py``, ``get_laplacian.py``, ``grid.py``,
``normalized_cut.py``, ``homophily.py``, ``geodesic.py``).

Host-side (numpy/scipy/networkx) like the reference; ``get_laplacian`` /
``dense_to_sparse`` / ``normalized_cut`` also accept jnp arrays and stay
jittable where shapes allow.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..data.graph import Graph
from ..ops.segment import segment_sum
from .degree import degree


def dense_to_sparse(adj):
    """reference ``utils/sparse.py:dense_to_sparse`` — COO of the nonzero
    entries of a dense ``[N, N]`` adjacency; returns (edge_index, values)."""
    adj = np.asarray(adj)
    row, col = np.nonzero(adj)
    return np.stack([row, col]).astype(np.int64), adj[row, col]


def to_scipy_sparse_matrix(senders, receivers, edge_attr=None,
                           num_nodes: Optional[int] = None):
    """reference ``utils/convert.py:to_scipy_sparse_matrix``."""
    import scipy.sparse as sp

    s = np.asarray(senders)
    r = np.asarray(receivers)
    n = int(num_nodes) if num_nodes is not None else int(max(s.max(), r.max())) + 1
    v = np.ones(len(s)) if edge_attr is None else np.asarray(edge_attr).reshape(-1)
    return sp.coo_matrix((v, (s, r)), shape=(n, n))


def from_scipy_sparse_matrix(A) -> Tuple[np.ndarray, np.ndarray]:
    """reference ``utils/convert.py:from_scipy_sparse_matrix`` —
    (edge_index, edge_weight)."""
    A = A.tocoo()
    return (np.stack([A.row, A.col]).astype(np.int64), np.asarray(A.data))


def to_networkx(g: Graph, *, to_undirected: bool = False):
    """reference ``utils/convert.py:to_networkx`` — nodes carry ``x``/``pos``
    rows as attributes when present."""
    import networkx as nx

    G = nx.Graph() if to_undirected else nx.DiGraph()
    n = int(np.sum(g.n_node))
    for i in range(n):
        attrs = {}
        if g.nodes is not None:
            attrs["x"] = np.asarray(g.nodes)[i]
        G.add_node(i, **attrs)
    s, r = np.asarray(g.senders), np.asarray(g.receivers)
    w = None if g.edges is None else np.asarray(g.edges).reshape(len(s), -1)
    for e in range(len(s)):
        attrs = {} if w is None else {"edge_attr": w[e]}
        G.add_edge(int(s[e]), int(r[e]), **attrs)
    return G


def from_networkx(G) -> Graph:
    """reference ``utils/convert.py:from_networkx``."""
    nodes = sorted(G.nodes)
    relabel = {v: i for i, v in enumerate(nodes)}
    s, r = [], []
    for a, b in G.edges:
        s.append(relabel[a]); r.append(relabel[b])
        if not G.is_directed():
            s.append(relabel[b]); r.append(relabel[a])
    xs = [G.nodes[v].get("x") for v in nodes]
    x = (np.asarray(xs, np.float32) if all(v is not None for v in xs) and xs
         else np.zeros((len(nodes), 1), np.float32))
    return Graph(
        nodes=x,
        senders=np.asarray(s, np.int32),
        receivers=np.asarray(r, np.int32),
        n_node=np.asarray([len(nodes)], np.int32),
        n_edge=np.asarray([len(s)], np.int32),
    )


def to_trimesh(pos, face):  # pragma: no cover - optional dependency
    """reference ``utils/convert.py:to_trimesh`` (requires ``trimesh``)."""
    import trimesh

    return trimesh.Trimesh(vertices=np.asarray(pos),
                           faces=np.asarray(face).T, process=False)


def from_trimesh(mesh):  # pragma: no cover - optional dependency
    """reference ``utils/convert.py:from_trimesh`` — (pos, face)."""
    return (np.asarray(mesh.vertices, np.float32),
            np.asarray(mesh.faces, np.int64).T)


def grid(height: int, width: int) -> Tuple[np.ndarray, np.ndarray]:
    """reference ``utils/grid.py`` — 8-connected 2-D grid: (edge_index incl.
    self-loops, positions with y growing upward)."""
    n = height * width
    kernel = np.asarray([-width - 1, -1, width - 1, -width, 0, width,
                         -width + 1, 1, width + 1])
    row = np.repeat(np.arange(n), len(kernel))
    col = row + np.tile(kernel, n)
    # drop wrap-around pairs: neighbors must stay in adjacent columns
    ok = (col >= 0) & (col < n) & (np.abs(col % width - row % width) <= 1)
    row, col = row[ok], col[ok]
    order = np.lexsort((col, row))
    edge_index = np.stack([row[order], col[order]]).astype(np.int64)
    x = np.tile(np.arange(width, dtype=np.float32), height)
    y = np.repeat((height - 1) - np.arange(height, dtype=np.float32), width)
    return edge_index, np.stack([x, y], axis=1)


def get_laplacian(senders, receivers, edge_weight=None,
                  normalization: Optional[str] = None,
                  num_nodes: Optional[int] = None):
    """reference ``utils/get_laplacian.py`` — returns (senders, receivers,
    weights) of L = D − A (``None``), I − D^{-1/2}AD^{-1/2} (``"sym"``), or
    I − D^{-1}A (``"rw"``); self-loop entries appended at the tail."""
    assert normalization in (None, "sym", "rw")
    s = jnp.asarray(senders)
    r = jnp.asarray(receivers)
    n = int(num_nodes) if num_nodes is not None else int(jnp.maximum(s.max(), r.max())) + 1
    w = jnp.ones(s.shape[0]) if edge_weight is None else jnp.asarray(edge_weight)
    deg = segment_sum(w, r, n)  # weighted degree
    if normalization is None:
        lap_w = -w
        diag = deg
    elif normalization == "sym":
        dinv = jnp.where(deg > 0, jax_rsqrt(deg), 0.0)
        lap_w = -dinv[s] * w * dinv[r]
        diag = jnp.ones(n)
    else:  # rw
        dinv = jnp.where(deg > 0, 1.0 / deg, 0.0)
        lap_w = -dinv[r] * w
        diag = jnp.ones(n)
    loop = jnp.arange(n)
    return (jnp.concatenate([s, loop]), jnp.concatenate([r, loop]),
            jnp.concatenate([lap_w, diag]))


def jax_rsqrt(x):
    return 1.0 / jnp.sqrt(x)


def normalized_cut(senders, receivers, edge_attr,
                   num_nodes: Optional[int] = None):
    """reference ``utils/normalized_cut.py`` —
    ``e_ij * (1/deg(i) + 1/deg(j))``."""
    s = jnp.asarray(senders)
    r = jnp.asarray(receivers)
    n = int(num_nodes) if num_nodes is not None else int(jnp.maximum(s.max(), r.max())) + 1
    d = 1.0 / jnp.maximum(degree(r, n), 1e-12)
    return jnp.asarray(edge_attr) * (d[s] + d[r])


def homophily_ratio(senders, receivers, y) -> float:
    """reference ``utils/homophily.py`` — fraction of edges joining
    same-label endpoints."""
    y = np.asarray(y)
    return float((y[np.asarray(senders)] == y[np.asarray(receivers)]).mean())


def geodesic_distance(pos, face, src=None, dest=None, *, norm: bool = True):
    """reference ``utils/geodesic.py``'s role.  The reference shells out to
    the ``gdist`` package (exact polyhedral geodesics); here: shortest paths
    over the triangle-edge graph weighted by Euclidean edge length
    (scipy ``dijkstra``) — the standard graph-geodesic approximation, no
    extra dependency.  ``norm`` divides by sqrt(surface area) like the
    reference."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import dijkstra

    pos = np.asarray(pos, np.float64)
    face = np.asarray(face)
    if face.shape[0] != 3:
        face = face.T
    n = pos.shape[0]
    s = np.concatenate([face[0], face[1], face[2]])
    r = np.concatenate([face[1], face[2], face[0]])
    # dedupe (triangles share edges; scipy COO would SUM duplicate weights)
    key = np.unique(np.minimum(s, r).astype(np.int64) * n + np.maximum(s, r))
    s, r = key // n, key % n
    w = np.linalg.norm(pos[s] - pos[r], axis=1)
    A = sp.coo_matrix((np.concatenate([w, w]),
                       (np.concatenate([s, r]), np.concatenate([r, s]))),
                      shape=(n, n)).tocsr()
    idx = np.arange(n) if src is None else np.atleast_1d(np.asarray(src))
    d = dijkstra(A, directed=False, indices=idx)
    if dest is not None:
        d = d[np.arange(len(idx)), np.atleast_1d(np.asarray(dest))]
    if norm:
        a, b, c = pos[face[0]], pos[face[1]], pos[face[2]]
        area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1).sum()
        d = d / np.sqrt(max(area, 1e-300))
    return d
