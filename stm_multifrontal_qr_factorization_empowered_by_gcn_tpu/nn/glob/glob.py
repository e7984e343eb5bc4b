"""Global graph pooling — reference ``torch_geometric/nn/glob/glob.py:6-71``.

Masked segment reductions over the node→graph id vector.  Padding nodes are
neutralized per-op (sum→0, mean→excluded from the denominator, max→identity),
so padded batches give bit-identical results to unpadded ones.
"""
from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp

from ...data.graph import Graph
from ...ops.segment import segment_max, segment_mean, segment_min, segment_sum


def _resolve(graph_or_ids, num_graphs, node_mask):
    if isinstance(graph_or_ids, Graph):
        g = graph_or_ids
        ids = g.node_graph_ids()
        num_graphs = g.num_graphs
        node_mask = g.node_mask() if node_mask is None else node_mask
    else:
        ids = graph_or_ids
        if num_graphs is None:
            raise ValueError("num_graphs required when passing raw graph ids")
    return ids, num_graphs, node_mask


def global_add_pool(
    x: jnp.ndarray,
    graph_or_ids: Union[Graph, jnp.ndarray],
    *,
    num_graphs: Optional[int] = None,
    node_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-graph sum of node features over the ``batch`` vector (reference ``nn/glob/glob.py:global_add_pool``)."""
    ids, num_graphs, node_mask = _resolve(graph_or_ids, num_graphs, node_mask)
    return segment_sum(x, ids, num_graphs, mask=node_mask, indices_are_sorted=True)


def global_mean_pool(
    x: jnp.ndarray,
    graph_or_ids: Union[Graph, jnp.ndarray],
    *,
    num_graphs: Optional[int] = None,
    node_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-graph mean of node features (mask-aware denominators)."""
    ids, num_graphs, node_mask = _resolve(graph_or_ids, num_graphs, node_mask)
    return segment_mean(x, ids, num_graphs, mask=node_mask, indices_are_sorted=True)


def global_max_pool(
    x: jnp.ndarray,
    graph_or_ids: Union[Graph, jnp.ndarray],
    *,
    num_graphs: Optional[int] = None,
    node_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-graph max of node features (masked slots = -inf identity)."""
    ids, num_graphs, node_mask = _resolve(graph_or_ids, num_graphs, node_mask)
    return segment_max(x, ids, num_graphs, mask=node_mask, indices_are_sorted=True)


def global_min_pool(
    x: jnp.ndarray,
    graph_or_ids: Union[Graph, jnp.ndarray],
    *,
    num_graphs: Optional[int] = None,
    node_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-graph min of node features (masked slots = +inf identity)."""
    ids, num_graphs, node_mask = _resolve(graph_or_ids, num_graphs, node_mask)
    return segment_min(x, ids, num_graphs, mask=node_mask, indices_are_sorted=True)
