"""Edge-level train/val/test splitting — reference
``torch_geometric/utils/train_test_split_edges.py``.

The reference mutates the ``Data`` object in place; our ``Graph`` is an
immutable pytree, so the split comes back as a NamedTuple of edge arrays
(plus the dense train-negative mask, kept boolean like the reference)."""
from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np

from ..data.graph import Graph


class EdgeSplit(NamedTuple):
    train_pos_edge_index: np.ndarray  # [2, 2*E_train] (symmetrized)
    val_pos_edge_index: np.ndarray
    test_pos_edge_index: np.ndarray
    val_neg_edge_index: np.ndarray
    test_neg_edge_index: np.ndarray
    train_neg_adj_mask: np.ndarray    # [N, N] bool upper-triangular


def train_test_split_edges(
    g: Graph, val_ratio: float = 0.05, test_ratio: float = 0.1, *, seed: int = 0
) -> EdgeSplit:
    """Same protocol as the reference: undirected edges deduped to the upper
    triangle, shuffled, split by ratio; negatives drawn from the complement
    (val/test negatives removed from the train negative mask)."""
    n = int(np.sum(g.n_node))
    row = np.asarray(g.senders)
    col = np.asarray(g.receivers)
    mask = row < col
    row, col = row[mask], col[mask]

    n_v = int(math.floor(val_ratio * len(row)))
    n_t = int(math.floor(test_ratio * len(row)))
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(row))
    row, col = row[perm], col[perm]

    val_pos = np.stack([row[:n_v], col[:n_v]])
    test_pos = np.stack([row[n_v:n_v + n_t], col[n_v:n_v + n_t]])
    tr, tc = row[n_v + n_t:], col[n_v + n_t:]
    train_pos = np.stack(
        [np.concatenate([tr, tc]), np.concatenate([tc, tr])]
    )

    neg_mask = np.triu(np.ones((n, n), bool), k=1)
    neg_mask[row, col] = False
    neg_r, neg_c = np.nonzero(neg_mask)
    pick = rng.permutation(len(neg_r))[: n_v + n_t]
    neg_r, neg_c = neg_r[pick], neg_c[pick]
    neg_mask[neg_r, neg_c] = False

    return EdgeSplit(
        train_pos_edge_index=train_pos.astype(np.int64),
        val_pos_edge_index=val_pos.astype(np.int64),
        test_pos_edge_index=test_pos.astype(np.int64),
        val_neg_edge_index=np.stack([neg_r[:n_v], neg_c[:n_v]]).astype(np.int64),
        test_neg_edge_index=np.stack(
            [neg_r[n_v:n_v + n_t], neg_c[n_v:n_v + n_t]]
        ).astype(np.int64),
        train_neg_adj_mask=neg_mask,
    )
