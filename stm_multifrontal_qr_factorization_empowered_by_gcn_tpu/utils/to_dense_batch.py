"""Padded dense views of node sets — reference ``utils/to_dense_batch.py``.

This is the one reference utility that was *already* TPU-shaped (fixed-size
padding + mask); here it is the bridge from segment layout to ``[G, maxN, F]``
dense layout used by TopK pooling and dense conv variants.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def to_dense_batch(
    x: jnp.ndarray,
    graph_ids: jnp.ndarray,
    n_node: jnp.ndarray,
    max_nodes: int,
    *,
    num_graphs: Optional[int] = None,
    fill_value: float = 0.0,
    node_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter segment-layout nodes into a dense ``[G, max_nodes, F]`` tensor.

    Returns ``(dense, mask)`` where ``mask`` is ``[G, max_nodes]`` bool.
    ``max_nodes`` must be a static bound ≥ every per-graph node count.
    """
    num_graphs = int(n_node.shape[0]) if num_graphs is None else num_graphs
    starts = jnp.cumsum(n_node) - n_node  # first node offset per graph
    pos_in_graph = jnp.arange(x.shape[0]) - starts[graph_ids]
    valid = pos_in_graph < max_nodes
    if node_mask is not None:
        valid = valid & node_mask
    pos_in_graph = jnp.clip(pos_in_graph, 0, max_nodes - 1)
    flat_idx = graph_ids * max_nodes + pos_in_graph
    # route invalid rows to a scratch slot past the end
    flat_idx = jnp.where(valid, flat_idx, num_graphs * max_nodes)
    feat_shape = x.shape[1:]
    dense = jnp.full((num_graphs * max_nodes + 1,) + feat_shape, fill_value, x.dtype)
    dense = dense.at[flat_idx].set(x, mode="drop")
    dense = dense[:-1].reshape((num_graphs, max_nodes) + feat_shape)
    counts = jnp.minimum(n_node, max_nodes)
    mask = jnp.arange(max_nodes)[None, :] < counts[:, None]
    return dense, mask


def from_dense_batch(
    dense: jnp.ndarray,
    graph_ids: jnp.ndarray,
    n_node: jnp.ndarray,
) -> jnp.ndarray:
    """Gather back from ``[G, maxN, F]`` into segment layout ``[N, F]``."""
    max_nodes = dense.shape[1]
    starts = jnp.cumsum(n_node) - n_node
    pos_in_graph = jnp.arange(graph_ids.shape[0]) - starts[graph_ids]
    pos_in_graph = jnp.clip(pos_in_graph, 0, max_nodes - 1)
    flat = dense.reshape((-1,) + dense.shape[2:])
    return flat[graph_ids * max_nodes + pos_in_graph]
