"""Undirected/coalesce utilities (reference: ``utils/undirected.py``,
``utils/coalesce`` semantics inside torch_sparse). Host-side NumPy."""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def coalesce(
    edge_index: np.ndarray,
    edge_attr: Optional[np.ndarray] = None,
    *,
    num_nodes: Optional[int] = None,
    reduce: str = "add",
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Sort edges (row-major), merge duplicates, reduce attrs."""
    edge_index = np.asarray(edge_index)
    n = int(num_nodes) if num_nodes is not None else int(edge_index.max()) + 1
    key = edge_index[0].astype(np.int64) * n + edge_index[1].astype(np.int64)
    order = np.argsort(key, kind="stable")
    key = key[order]
    uniq, first = np.unique(key, return_index=True)
    ei = np.stack([(uniq // n).astype(edge_index.dtype), (uniq % n).astype(edge_index.dtype)])
    if edge_attr is None:
        return ei, None
    edge_attr = np.asarray(edge_attr)[order]
    seg = np.repeat(np.arange(len(uniq)), np.diff(np.append(first, len(key))))
    if reduce in ("add", "sum"):
        out = np.zeros((len(uniq),) + edge_attr.shape[1:], edge_attr.dtype)
        np.add.at(out, seg, edge_attr)
    elif reduce == "mean":
        out = np.zeros((len(uniq),) + edge_attr.shape[1:], np.float64)
        np.add.at(out, seg, edge_attr)
        counts = np.bincount(seg, minlength=len(uniq)).reshape((-1,) + (1,) * (edge_attr.ndim - 1))
        out = (out / counts).astype(edge_attr.dtype)
    elif reduce == "max":
        out = np.full((len(uniq),) + edge_attr.shape[1:], -np.inf, edge_attr.dtype)
        np.maximum.at(out, seg, edge_attr)
    elif reduce == "first":
        out = edge_attr[first]
    else:
        raise ValueError(f"unknown reduce {reduce!r}")
    return ei, out


def to_undirected(
    edge_index: np.ndarray,
    edge_attr: Optional[np.ndarray] = None,
    *,
    num_nodes: Optional[int] = None,
    reduce: str = "add",
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Symmetrize: add each edge's reverse, then coalesce duplicates with ``reduce`` — reference ``utils/undirected.py:to_undirected``."""
    edge_index = np.asarray(edge_index)
    both = np.concatenate([edge_index, edge_index[::-1]], axis=1)
    attr = None if edge_attr is None else np.concatenate([edge_attr, edge_attr], axis=0)
    return coalesce(both, attr, num_nodes=num_nodes, reduce=reduce)


def is_undirected(edge_index: np.ndarray, *, num_nodes: Optional[int] = None) -> bool:
    """True if the edge set equals its own transpose."""
    edge_index = np.asarray(edge_index)
    n = int(num_nodes) if num_nodes is not None else int(edge_index.max()) + 1
    k1 = set((edge_index[0].astype(np.int64) * n + edge_index[1]).tolist())
    k2 = set((edge_index[1].astype(np.int64) * n + edge_index[0]).tolist())
    return k1 == k2


def sort_by_receiver(
    edge_index: np.ndarray, edge_attr: Optional[np.ndarray] = None
) -> Tuple[np.ndarray, Optional[np.ndarray], np.ndarray]:
    """Stable sort edges by receiver (CSR-by-destination order).

    Our padded batches store edges in this order so device segment ops can use
    ``indices_are_sorted=True``. Returns (edge_index, edge_attr, perm).
    """
    edge_index = np.asarray(edge_index)
    perm = np.argsort(edge_index[1], kind="stable")
    ea = None if edge_attr is None else np.asarray(edge_attr)[perm]
    return edge_index[:, perm], ea, perm


def sort_edge_index(edge_index, edge_attr=None, *, num_nodes=None):
    """reference ``utils/sort_edge_index.py`` — row-major (sender, receiver)
    sort; returns (edge_index, edge_attr)."""
    edge_index = np.asarray(edge_index)
    n = (int(edge_index.max()) + 1) if num_nodes is None else int(num_nodes)
    order = np.argsort(edge_index[0].astype(np.int64) * n + edge_index[1],
                       kind="stable")
    out = edge_index[:, order]
    return out, (None if edge_attr is None else np.asarray(edge_attr)[order])
