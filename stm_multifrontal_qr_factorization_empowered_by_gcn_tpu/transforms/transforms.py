"""Graph transforms — reference ``torch_geometric/transforms/`` (42 files).

Host-side NumPy callables ``Graph -> Graph``, composable with
:class:`Compose`; applied through the dataset ``transform``/``pre_transform``
hooks exactly like the reference (``data/dataset.py:75-92``).  They run in
the input pipeline (before padding), so dynamic shapes are fine here.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np

from ..data.graph import Graph


def _as_graph(g, pos):
    """Accept a :class:`Graph` or a pre-graph :class:`~.geometric.MeshData`
    (e.g. the output of :class:`~.geometric.ToSLIC`) — for MeshData, the
    positions drive the knn/radius construction and ``x`` (or the positions)
    become the node features."""
    from .geometric import MeshData

    if isinstance(g, MeshData):
        p = np.asarray(g.pos, np.float32)
        nodes = p if g.x is None else np.asarray(g.x, np.float32)
        graph = Graph(
            nodes=nodes,
            senders=np.zeros(0, np.int32),
            receivers=np.zeros(0, np.int32),
            n_node=np.asarray([len(p)], np.int32),
            n_edge=np.asarray([0], np.int32),
            y=g.y,
        )
        return graph, (p if pos is None else pos)
    return g, pos


class Compose:
    """reference ``transforms/compose.py``"""

    def __init__(self, transforms: Sequence[Callable[[Graph], Graph]]):
        self.transforms = list(transforms)

    def __call__(self, g: Graph) -> Graph:
        for t in self.transforms:
            g = t(g)
        return g

    def __repr__(self):
        inner = ", ".join(repr(t) for t in self.transforms)
        return f"Compose([{inner}])"


class AddSelfLoops:
    """reference ``transforms/add_self_loops.py`` — appends one (i, i) edge
    per node (existing self loops preserved unless ``remove_first``)."""

    def __init__(self, fill_value: float = 1.0, remove_first: bool = False):
        self.fill_value = fill_value
        self.remove_first = remove_first

    def __call__(self, g: Graph) -> Graph:
        if self.remove_first:
            g = RemoveSelfLoops()(g)
        n = int(g.n_node.sum())
        loops = np.arange(n, dtype=np.int32)
        senders = np.concatenate([np.asarray(g.senders), loops])
        receivers = np.concatenate([np.asarray(g.receivers), loops])
        edges = g.edges
        if edges is not None:
            edges = np.asarray(edges)
            fill = np.full((n,) + edges.shape[1:], self.fill_value, edges.dtype)
            edges = np.concatenate([edges, fill])
        return g.replace(
            senders=senders, receivers=receivers, edges=edges,
            n_edge=np.asarray([senders.shape[0]], np.int32),
        )


class RemoveSelfLoops:
    """Transform dropping ``i -> i`` edges (reference ``transforms/remove_self_loops.py``)."""
    def __call__(self, g: Graph) -> Graph:
        s, r = np.asarray(g.senders), np.asarray(g.receivers)
        keep = s != r
        edges = None if g.edges is None else np.asarray(g.edges)[keep]
        return g.replace(
            senders=s[keep], receivers=r[keep], edges=edges,
            n_edge=np.asarray([int(keep.sum())], np.int32),
        )


class NormalizeFeatures:
    """reference ``transforms/normalize_features.py`` — row-normalize x to
    sum 1."""

    def __call__(self, g: Graph) -> Graph:
        x = np.asarray(g.nodes, np.float32)
        s = x.sum(axis=-1, keepdims=True)
        s[s == 0] = 1
        return g.replace(nodes=x / s)


class ToUndirected:
    """reference ``transforms/to_undirected.py`` — add reverse edges and
    coalesce duplicates (summing edge weights)."""

    def __init__(self, reduce: str = "add"):
        self.reduce = reduce

    def __call__(self, g: Graph) -> Graph:
        s = np.concatenate([np.asarray(g.senders), np.asarray(g.receivers)])
        r = np.concatenate([np.asarray(g.receivers), np.asarray(g.senders)])
        w = None
        if g.edges is not None:
            e = np.asarray(g.edges)
            w = np.concatenate([e, e])
        return _coalesce(g, s, r, w, self.reduce)


class Coalesce:
    """Transform merging duplicate edges (sum/mean/max attrs) in receiver-major order."""
    def __call__(self, g: Graph) -> Graph:
        w = None if g.edges is None else np.asarray(g.edges)
        return _coalesce(g, np.asarray(g.senders), np.asarray(g.receivers), w, "add")


def _coalesce(g: Graph, s, r, w, reduce: str) -> Graph:
    n = int(g.n_node.sum())
    key = s.astype(np.int64) * n + r
    uniq, inv = np.unique(key, return_inverse=True)
    s2 = (uniq // n).astype(np.int32)
    r2 = (uniq % n).astype(np.int32)
    w2 = None
    if w is not None:
        w = np.asarray(w, np.float32)
        flat = w.reshape(len(w), -1)
        acc = np.zeros((len(uniq), flat.shape[1]), np.float32)
        np.add.at(acc, inv, flat)
        if reduce == "mean":
            cnt = np.bincount(inv, minlength=len(uniq)).astype(np.float32)
            acc = acc / cnt[:, None]
        w2 = acc.reshape((len(uniq),) + w.shape[1:])
    return g.replace(
        senders=s2, receivers=r2, edges=w2,
        n_edge=np.asarray([len(uniq)], np.int32),
    )


class GCNNorm:
    """reference ``transforms/gcn_norm.py`` — precompute symmetric GCN edge
    weights (with self loops materialized, matching the reference's eager
    variant; the in-model ``ops.norm.gcn_norm`` is the analytic one)."""

    def __init__(self, add_self_loops: bool = True):
        self.add_self_loops = add_self_loops

    def __call__(self, g: Graph) -> Graph:
        if self.add_self_loops:
            g = AddSelfLoops()(g)
        s, r = np.asarray(g.senders), np.asarray(g.receivers)
        n = int(g.n_node.sum())
        w = (
            np.ones(len(s), np.float32)
            if g.edges is None
            else np.asarray(g.edges, np.float32).reshape(len(s))
        )
        deg = np.zeros(n, np.float32)
        np.add.at(deg, r, w)
        dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0)
        return g.replace(edges=dinv[s] * w * dinv[r])


class TwoHop:
    """reference ``transforms/two_hop.py`` — add 2-hop edges."""

    def __call__(self, g: Graph) -> Graph:
        import scipy.sparse as sp

        n = int(g.n_node.sum())
        s, r = np.asarray(g.senders), np.asarray(g.receivers)
        a = sp.coo_matrix((np.ones(len(s)), (r, s)), shape=(n, n)).tocsr()
        a2 = (a @ a).tocoo()
        s2 = np.concatenate([s, a2.col.astype(np.int32)])
        r2 = np.concatenate([r, a2.row.astype(np.int32)])
        g2 = _coalesce(g.replace(edges=None), s2, r2, None, "add")
        return RemoveSelfLoops()(g2)


class KNNGraph:
    """reference ``transforms/knn_graph.py`` — k-nearest-neighbor edges from
    node positions (stored in ``nodes`` or a ``pos`` array)."""

    def __init__(self, k: int = 6, loop: bool = False):
        self.k = k
        self.loop = loop

    def __call__(self, g, pos: Optional[np.ndarray] = None) -> Graph:
        g, pos = _as_graph(g, pos)
        pos = np.asarray(g.nodes if pos is None else pos, np.float32)
        d2 = ((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
        if not self.loop:
            np.fill_diagonal(d2, np.inf)
        k = min(self.k, pos.shape[0] - (0 if self.loop else 1))
        nbr = np.argsort(d2, axis=1)[:, :k]
        receivers = np.repeat(np.arange(pos.shape[0], dtype=np.int32), k)
        senders = nbr.reshape(-1).astype(np.int32)
        return g.replace(
            senders=senders, receivers=receivers, edges=None,
            n_edge=np.asarray([len(senders)], np.int32),
        )


class RadiusGraph:
    """Transform connecting points within ``r`` (reference ``transforms/radius_graph.py``)."""
    def __init__(self, r: float, loop: bool = False):
        self.r = r
        self.loop = loop

    def __call__(self, g, pos: Optional[np.ndarray] = None) -> Graph:
        g, pos = _as_graph(g, pos)
        pos = np.asarray(g.nodes if pos is None else pos, np.float32)
        d2 = ((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
        if not self.loop:
            np.fill_diagonal(d2, np.inf)
        r_idx, s_idx = np.nonzero(d2 <= self.r**2)
        return g.replace(
            senders=s_idx.astype(np.int32), receivers=r_idx.astype(np.int32),
            edges=None, n_edge=np.asarray([len(s_idx)], np.int32),
        )


class Distance:
    """reference ``transforms/distance.py`` — edge attr = ‖pos_s − pos_r‖
    (normalized to [0,1] when ``norm``)."""

    def __init__(self, norm: bool = True, cat: bool = True):
        self.norm = norm
        self.cat = cat

    def __call__(self, g: Graph, pos: Optional[np.ndarray] = None) -> Graph:
        pos = np.asarray(g.nodes if pos is None else pos, np.float32)
        d = np.linalg.norm(
            pos[np.asarray(g.senders)] - pos[np.asarray(g.receivers)], axis=-1
        )[:, None]
        if self.norm and d.max() > 0:
            d = d / d.max()
        if self.cat and g.edges is not None:
            e = np.asarray(g.edges)
            e = e[:, None] if e.ndim == 1 else e
            d = np.concatenate([e, d], axis=-1)
        return g.replace(edges=d.astype(np.float32))


class Cartesian:
    """reference ``transforms/cartesian.py`` — edge attr = relative position."""

    def __init__(self, norm: bool = True, cat: bool = True):
        self.norm = norm
        self.cat = cat

    def __call__(self, g: Graph, pos: Optional[np.ndarray] = None) -> Graph:
        pos = np.asarray(g.nodes if pos is None else pos, np.float32)
        rel = pos[np.asarray(g.senders)] - pos[np.asarray(g.receivers)]
        if self.norm and np.abs(rel).max() > 0:
            rel = rel / (2 * np.abs(rel).max()) + 0.5
        if self.cat and g.edges is not None:
            e = np.asarray(g.edges)
            e = e[:, None] if e.ndim == 1 else e
            rel = np.concatenate([e, rel], axis=-1)
        return g.replace(edges=rel.astype(np.float32))


class LocalDegreeProfile:
    """reference ``transforms/local_degree_profile.py`` — append
    [deg, min/max/mean/std of neighbor degs] to x."""

    def __call__(self, g: Graph) -> Graph:
        n = int(g.n_node.sum())
        s, r = np.asarray(g.senders), np.asarray(g.receivers)
        deg = np.bincount(r, minlength=n).astype(np.float32)
        nd = deg[s]
        mins = np.full(n, np.inf, np.float32)
        maxs = np.full(n, -np.inf, np.float32)
        np.minimum.at(mins, r, nd)
        np.maximum.at(maxs, r, nd)
        sums = np.zeros(n, np.float32)
        np.add.at(sums, r, nd)
        cnt = np.maximum(deg, 1)
        mean = sums / cnt
        sq = np.zeros(n, np.float32)
        np.add.at(sq, r, nd**2)
        var = np.maximum(sq / cnt - mean**2, 0)
        mins[np.isinf(mins)] = 0
        maxs[np.isinf(maxs)] = 0
        prof = np.stack([deg, mins, maxs, mean, np.sqrt(var)], axis=1)
        x = np.asarray(g.nodes, np.float32)
        return g.replace(nodes=np.concatenate([x, prof], axis=1))


class OneHotDegree:
    """reference ``transforms/one_hot_degree.py``"""

    def __init__(self, max_degree: int, cat: bool = True):
        self.max_degree = max_degree
        self.cat = cat

    def __call__(self, g: Graph) -> Graph:
        n = int(g.n_node.sum())
        deg = np.bincount(np.asarray(g.receivers), minlength=n)
        deg = np.minimum(deg, self.max_degree)
        oh = np.eye(self.max_degree + 1, dtype=np.float32)[deg]
        x = np.asarray(g.nodes, np.float32)
        nodes = np.concatenate([x, oh], axis=1) if self.cat else oh
        return g.replace(nodes=nodes)


class TargetIndegree:
    """reference ``transforms/target_indegree.py`` — edge attr = normalized
    in-degree of target node."""

    def __init__(self, norm: bool = True, cat: bool = True):
        self.norm = norm
        self.cat = cat

    def __call__(self, g: Graph) -> Graph:
        n = int(g.n_node.sum())
        r = np.asarray(g.receivers)
        deg = np.bincount(r, minlength=n).astype(np.float32)
        attr = deg[r][:, None]
        if self.norm and attr.max() > 0:
            attr = attr / attr.max()
        if self.cat and g.edges is not None:
            e = np.asarray(g.edges)
            e = e[:, None] if e.ndim == 1 else e
            attr = np.concatenate([e, attr], axis=-1)
        return g.replace(edges=attr.astype(np.float32))


class GDC:
    """Graph Diffusion Convolution (reference ``transforms/gdc.py``):
    replace the adjacency with a sparsified diffusion matrix.

    diffusion: 'ppr' (personalized PageRank, closed form) or 'heat';
    sparsification: per-node top-k or global threshold.
    """

    def __init__(
        self,
        alpha: float = 0.15,
        t: float = 5.0,
        method: str = "ppr",
        sparsify: str = "topk",
        k: int = 64,
        eps: float = 1e-4,
        self_loops: bool = True,
    ):
        self.alpha = alpha
        self.t = t
        self.method = method
        self.sparsify = sparsify
        self.k = k
        self.eps = eps
        self.self_loops = self_loops

    def __call__(self, g: Graph) -> Graph:
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        n = int(g.n_node.sum())
        s, r = np.asarray(g.senders), np.asarray(g.receivers)
        w = np.ones(len(s)) if g.edges is None else np.asarray(g.edges, np.float64).reshape(len(s))
        a = sp.coo_matrix((w, (r, s)), shape=(n, n)).tocsr()
        if self.self_loops:
            a = a + sp.eye(n, format="csr")
        deg = np.asarray(a.sum(axis=0)).ravel()
        dinv = sp.diags(1.0 / np.maximum(deg, 1e-12))
        trans = a @ dinv  # column-stochastic

        if self.method == "ppr":
            # S = α (I − (1−α) T)^{-1}
            diff = self.alpha * spla.inv(
                sp.csc_matrix(sp.eye(n) - (1 - self.alpha) * trans)
            )
            diff = sp.csr_matrix(diff)
        elif self.method == "heat":
            m = sp.csc_matrix(self.t * (trans - sp.eye(n)))
            diff = sp.csr_matrix(spla.expm(m))
        else:
            raise ValueError(f"unknown diffusion {self.method!r}")

        dense = np.asarray(diff.todense())
        if self.sparsify == "topk":
            k = min(self.k, n)
            thresh_rows = -np.partition(-dense, k - 1, axis=0)[k - 1]
            dense[dense < thresh_rows[None, :]] = 0
        else:
            dense[dense < self.eps] = 0
        # column-normalize the sparsified matrix (reference GDC final step)
        colsum = dense.sum(axis=0, keepdims=True)
        dense = dense / np.maximum(colsum, 1e-12)
        rr, ss = np.nonzero(dense)
        return g.replace(
            senders=ss.astype(np.int32),
            receivers=rr.astype(np.int32),
            edges=dense[rr, ss].astype(np.float32),
            n_edge=np.asarray([len(rr)], np.int32),
        )
