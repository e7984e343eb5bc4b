"""Structural transforms — reference ``torch_geometric/transforms/``:
SIGN, LineGraph, LaplacianLambdaMax, RemoveIsolatedNodes, Constant,
ToDense, ToSparseTensor.

Host-side NumPy ``Graph -> Graph`` callables (input pipeline, pre-padding).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from ..data.graph import Graph


class Constant:
    """reference ``constant.py`` — append a constant feature column."""

    def __init__(self, value: float = 1.0, cat: bool = True):
        self.value = value
        self.cat = cat

    def __call__(self, g: Graph) -> Graph:
        n = int(np.sum(g.n_node))
        c = np.full((n, 1), self.value, np.float32)
        if g.nodes is not None and self.cat:
            x = np.asarray(g.nodes, np.float32)
            x = x[:, None] if x.ndim == 1 else x
            c = np.concatenate([x, c], axis=-1)
        return g.replace(nodes=c)


class RemoveIsolatedNodes:
    """reference ``remove_isolated_nodes.py`` — drop degree-0 nodes and
    relabel edges."""

    def __call__(self, g: Graph) -> Graph:
        n = int(np.sum(g.n_node))
        s, r = np.asarray(g.senders), np.asarray(g.receivers)
        keep = np.zeros(n, bool)
        keep[s] = True
        keep[r] = True
        new_id = np.cumsum(keep) - 1
        nodes = None if g.nodes is None else np.asarray(g.nodes)[keep]
        y = g.y
        if y is not None and len(np.asarray(y)) == n:
            y = np.asarray(y)[keep]
        return g.replace(
            nodes=nodes,
            senders=new_id[s].astype(np.int32),
            receivers=new_id[r].astype(np.int32),
            n_node=np.asarray([int(keep.sum())], np.int32),
            y=y,
        )


class SIGN:
    """reference ``sign.py`` — precompute X^(i) = (D^-1/2 A D^-1/2)^i X for
    i = 1..K.  The reference stores them as ``data.x1..xK``; this framework's
    Graph is a fixed NamedTuple, so they are **concatenated feature-wise**:
    ``nodes = [X ‖ X¹ ‖ … ‖ X^K]`` (documented deviation — SIGN heads consume
    them through per-hop slices of width F)."""

    def __init__(self, K: int):
        self.K = K

    def __call__(self, g: Graph) -> Graph:
        n = int(np.sum(g.n_node))
        s, r = np.asarray(g.senders), np.asarray(g.receivers)
        x = np.asarray(g.nodes, np.float64)
        deg = np.bincount(r, minlength=n).astype(np.float64)
        dinv = np.where(deg > 0, deg**-0.5, 0.0)
        w = dinv[r] * dinv[s]
        xs = [x]
        for _ in range(self.K):
            nxt = np.zeros_like(x)
            np.add.at(nxt, r, w[:, None] * xs[-1][s])
            xs.append(nxt)
        return g.replace(nodes=np.concatenate(xs, axis=-1).astype(np.float32))


class LineGraph:
    """reference ``line_graph.py`` — nodes' = coalesced edges; edges' connect
    edges sharing an endpoint.  Directed mode links e1=(a→b) to e2=(b→c);
    undirected mode merges reciprocal pairs and sums their attributes."""

    def __init__(self, force_directed: bool = False):
        self.force_directed = force_directed

    def __call__(self, g: Graph) -> Graph:
        n = int(np.sum(g.n_node))
        s = np.asarray(g.senders).astype(np.int64)
        r = np.asarray(g.receivers).astype(np.int64)
        ea = None if g.edges is None else np.asarray(g.edges, np.float64)
        # coalesce (sum duplicate attrs) — reference coalesce semantics
        key = s * n + r
        order = np.argsort(key, kind="stable")
        key, s, r = key[order], s[order], r[order]
        uniq, first, inv = np.unique(key, return_index=True, return_inverse=True)
        if ea is not None:
            ea2 = np.zeros((len(uniq),) + ea.shape[1:])
            np.add.at(ea2, inv, ea[order])
            ea = ea2
        s, r = s[first], r[first]

        directed = self.force_directed or not _is_undirected(s, r, n)
        if directed:
            e = len(s)
            rows, cols = [], []
            by_src = {}
            for eid, a in enumerate(s):
                by_src.setdefault(int(a), []).append(eid)
            for eid in range(e):
                for e2 in by_src.get(int(r[eid]), ()):
                    rows.append(eid)
                    cols.append(e2)
            x = ea
            num = e
        else:
            m = s < r
            si, ri = s[m], r[m]
            e = len(si)  # undirected edge count
            # pair ids: edge k is the k-th (s<r) pair; attrs of (a,b)+(b,a)
            pair_id = {(int(a), int(b)): k for k, (a, b) in enumerate(zip(si, ri))}
            if ea is not None:
                x = np.zeros((e,) + ea.shape[1:])
                for eid, (a, b) in enumerate(zip(s, r)):
                    k = pair_id.get((min(a, b), max(a, b)))
                    if k is not None:
                        x[k] += ea[eid]
            else:
                x = None
            incident = {}
            for k, (a, b) in enumerate(zip(si, ri)):
                incident.setdefault(int(a), []).append(k)
                incident.setdefault(int(b), []).append(k)
            rows, cols = [], []
            for v, es in incident.items():
                for k1 in es:
                    for k2 in es:
                        if k1 != k2:
                            rows.append(k1)
                            cols.append(k2)
            num = e
        return Graph(
            nodes=None if x is None else np.asarray(x, np.float32),
            senders=np.asarray(rows, np.int32),
            receivers=np.asarray(cols, np.int32),
            n_node=np.asarray([num], np.int32),
            n_edge=np.asarray([len(rows)], np.int32),
        )


def _is_undirected(s, r, n) -> bool:
    fwd = set(zip(s.tolist(), r.tolist()))
    return all((b, a) in fwd for a, b in fwd)


class LaplacianLambdaMax:
    """reference ``laplacian_lambda_max.py`` — largest Laplacian eigenvalue
    (for ChebConv); stored in ``globals`` as a length-1 array."""

    def __init__(self, normalization: Optional[str] = None,
                 is_undirected: bool = False):
        if normalization not in (None, "sym", "rw"):
            raise ValueError(f"bad normalization {normalization!r}")
        self.normalization = normalization
        self.is_undirected = is_undirected

    def __call__(self, g: Graph) -> Graph:
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        n = int(np.sum(g.n_node))
        s, r = np.asarray(g.senders), np.asarray(g.receivers)
        w = (
            np.ones(len(s))
            if g.edges is None
            else np.asarray(g.edges, np.float64).reshape(len(s), -1)[:, 0]
        )
        a = sp.coo_matrix((w, (r, s)), shape=(n, n)).tocsr()
        deg = np.asarray(a.sum(axis=1)).ravel()
        if self.normalization is None:
            lap = sp.diags(deg) - a
        elif self.normalization == "sym":
            dinv = np.where(deg > 0, deg**-0.5, 0)
            lap = sp.eye(n) - sp.diags(dinv) @ a @ sp.diags(dinv)
        else:
            dinv = np.where(deg > 0, 1.0 / deg, 0)
            lap = sp.eye(n) - sp.diags(dinv) @ a
        sym = self.is_undirected and self.normalization != "rw"
        if n <= 2:
            lmax = float(np.max(np.linalg.eigvals(lap.toarray()).real))
        else:
            which = "LA" if sym else "LR"
            try:
                if sym:
                    val = spla.eigsh(lap, k=1, which=which,
                                     return_eigenvectors=False)
                else:
                    val = spla.eigs(lap, k=1, which=which,
                                    return_eigenvectors=False)
                lmax = float(np.real(val[0]))
            except Exception:
                lmax = float(np.max(np.linalg.eigvals(lap.toarray()).real))
        lam = np.asarray([lmax], np.float32)
        if g.globals is not None:
            lam = np.concatenate([np.asarray(g.globals).ravel(), lam])
        return g.replace(globals=lam)


class DenseGraph(NamedTuple):
    """Output of :class:`ToDense` (reference returns mutated Data)."""

    adj: np.ndarray        # [N, N]
    x: Optional[np.ndarray]
    y: Optional[np.ndarray]
    mask: np.ndarray       # [N] validity


class ToDense:
    """reference ``to_dense.py`` — pad to ``num_nodes`` and densify adj."""

    def __init__(self, num_nodes: Optional[int] = None):
        self.num_nodes = num_nodes

    def __call__(self, g: Graph) -> DenseGraph:
        n = int(np.sum(g.n_node))
        size = self.num_nodes or n
        if size < n:
            raise ValueError(f"num_nodes {size} < actual {n}")
        s, r = np.asarray(g.senders), np.asarray(g.receivers)
        w = (
            np.ones(len(s), np.float32)
            if g.edges is None
            else np.asarray(g.edges, np.float32).reshape(len(s), -1)[:, 0]
        )
        adj = np.zeros((size, size), np.float32)
        adj[r, s] = w
        x = None
        if g.nodes is not None:
            xa = np.asarray(g.nodes, np.float32)
            x = np.zeros((size,) + xa.shape[1:], np.float32)
            x[:n] = xa
        y = g.y
        if y is not None and len(np.asarray(y)) == n:
            ya = np.asarray(y)
            y = np.zeros((size,) + ya.shape[1:], ya.dtype)
            y[:n] = ya
        mask = np.zeros(size, bool)
        mask[:n] = True
        return DenseGraph(adj=adj, x=x, y=y, mask=mask)


class ToSparseTensor:
    """reference ``to_sparse_tensor.py`` role: pre-arrange edges for the
    fused sparse path.  The torch version builds a CSR ``SparseTensor``; this
    framework's fused paths (``ops/plan.build_spmm_plan``, ELL/BSR) want
    **receiver-major sorted** edges with ``indices_are_sorted`` guarantees —
    this transform performs that sort (stable, sender-second) so downstream
    ``segment_*`` calls hit the sorted fast path."""

    def __init__(self, remove_edge_index: bool = False):
        self.remove_edge_index = remove_edge_index  # kept for API parity

    def __call__(self, g: Graph) -> Graph:
        s, r = np.asarray(g.senders), np.asarray(g.receivers)
        order = np.lexsort((s, r))
        edges = None if g.edges is None else np.asarray(g.edges)[order]
        return g.replace(
            senders=s[order].astype(np.int32),
            receivers=r[order].astype(np.int32),
            edges=edges,
        )
