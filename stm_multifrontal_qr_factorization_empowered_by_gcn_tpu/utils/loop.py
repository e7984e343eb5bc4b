"""Self-loop utilities (reference: ``torch_geometric/utils/loop.py``).

Host-side (NumPy) variants change the edge count and are meant for the
preprocessing pipeline; on-device GCN normalization avoids materializing
self-loop edges entirely (see ``ops/norm.py``), which is the TPU-first design.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def remove_self_loops(
    edge_index: np.ndarray, edge_attr: Optional[np.ndarray] = None
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Drop ``i -> i`` edges (and their attrs) — reference ``utils/loop.py:remove_self_loops``."""
    edge_index = np.asarray(edge_index)
    keep = edge_index[0] != edge_index[1]
    edge_index = edge_index[:, keep]
    if edge_attr is not None:
        edge_attr = np.asarray(edge_attr)[keep]
    return edge_index, edge_attr


def add_self_loops(
    edge_index: np.ndarray,
    edge_weight: Optional[np.ndarray] = None,
    *,
    fill_value: float = 1.0,
    num_nodes: Optional[int] = None,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Append one ``i -> i`` edge per node with ``fill_value`` weight — reference ``utils/loop.py:add_self_loops``."""
    edge_index = np.asarray(edge_index)
    n = int(num_nodes) if num_nodes is not None else int(edge_index.max()) + 1
    loops = np.arange(n, dtype=edge_index.dtype)
    edge_index = np.concatenate([edge_index, np.stack([loops, loops])], axis=1)
    if edge_weight is not None:
        edge_weight = np.concatenate(
            [np.asarray(edge_weight), np.full(n, fill_value, dtype=np.asarray(edge_weight).dtype)]
        )
    return edge_index, edge_weight


def add_remaining_self_loops(
    edge_index: np.ndarray,
    edge_weight: Optional[np.ndarray] = None,
    *,
    fill_value: float = 1.0,
    num_nodes: Optional[int] = None,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Add a loop only for nodes that lack one (reference ``loop.py:60-98``)."""
    edge_index = np.asarray(edge_index)
    n = int(num_nodes) if num_nodes is not None else int(edge_index.max()) + 1
    has_loop = np.zeros(n, dtype=bool)
    loop_mask = edge_index[0] == edge_index[1]
    has_loop[edge_index[0][loop_mask]] = True
    missing = np.nonzero(~has_loop)[0].astype(edge_index.dtype)
    edge_index = np.concatenate([edge_index, np.stack([missing, missing])], axis=1)
    if edge_weight is not None:
        edge_weight = np.asarray(edge_weight)
        edge_weight = np.concatenate(
            [edge_weight, np.full(len(missing), fill_value, dtype=edge_weight.dtype)]
        )
    return edge_index, edge_weight


def contains_self_loops(edge_index: np.ndarray) -> bool:
    """True if any edge has ``sender == receiver``."""
    edge_index = np.asarray(edge_index)
    return bool(np.any(edge_index[0] == edge_index[1]))


def segregate_self_loops(
    edge_index: np.ndarray, edge_attr: Optional[np.ndarray] = None
) -> Tuple[np.ndarray, Optional[np.ndarray], np.ndarray, Optional[np.ndarray]]:
    """reference ``loop.py:segregate_self_loops`` — (edge_index, edge_attr,
    loop_edge_index, loop_edge_attr)."""
    edge_index = np.asarray(edge_index)
    mask = edge_index[0] != edge_index[1]
    loops = edge_index[:, ~mask]
    kept = edge_index[:, mask]
    if edge_attr is None:
        return kept, None, loops, None
    edge_attr = np.asarray(edge_attr)
    return kept, edge_attr[mask], loops, edge_attr[~mask]
