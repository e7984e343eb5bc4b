"""GlobalAttention, Set2Set, global_sort_pool — reference
``torch_geometric/nn/glob/{attention,set2set,sort}.py``."""
from __future__ import annotations

from typing import Callable, Optional, Union

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph import Graph
from ...ops.segment import segment_softmax, segment_sum


def _ids(graph_or_ids, num_graphs, node_mask):
    if isinstance(graph_or_ids, Graph):
        g = graph_or_ids
        return g.node_graph_ids(), g.num_graphs, g.node_mask()
    return graph_or_ids, num_graphs, node_mask


class GlobalAttention(nn.Module):
    """out_g = Σ_i softmax(h_gate(x_i))_g · h_feat(x_i)."""

    gate_nn: Callable
    feat_nn: Optional[Callable] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        graph_or_ids: Union[Graph, jnp.ndarray],
        *,
        num_graphs: Optional[int] = None,
        node_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        ids, num_graphs, node_mask = _ids(graph_or_ids, num_graphs, node_mask)
        gate = self.gate_nn(x)
        if gate.ndim == 1:
            gate = gate[:, None]
        feat = self.feat_nn(x) if self.feat_nn is not None else x
        alpha = segment_softmax(gate, ids, num_graphs, mask=node_mask)
        return segment_sum(alpha * feat, ids, num_graphs, mask=node_mask)


class Set2Set(nn.Module):
    """LSTM-iterated attention readout; output dim = 2·in_channels."""

    in_channels: int
    processing_steps: int

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        graph_or_ids: Union[Graph, jnp.ndarray],
        *,
        num_graphs: Optional[int] = None,
        node_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        ids, num_graphs, node_mask = _ids(graph_or_ids, num_graphs, node_mask)
        lstm = nn.LSTMCell(features=self.in_channels)
        carry = (
            jnp.zeros((num_graphs, self.in_channels), x.dtype),
            jnp.zeros((num_graphs, self.in_channels), x.dtype),
        )
        q_star = jnp.zeros((num_graphs, 2 * self.in_channels), x.dtype)
        for _ in range(self.processing_steps):
            carry, q = lstm(carry, q_star)
            e = jnp.sum(x * q[ids], axis=-1, keepdims=True)
            a = segment_softmax(e, ids, num_graphs, mask=node_mask)
            r = segment_sum(a * x, ids, num_graphs, mask=node_mask)
            q_star = jnp.concatenate([q, r], axis=-1)
        return q_star


def global_sort_pool(
    x: jnp.ndarray,
    graph_or_ids: Union[Graph, jnp.ndarray],
    k: int,
    *,
    num_graphs: Optional[int] = None,
    node_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """DGCNN sort pooling: per graph, sort nodes by last feature desc, keep k
    (zero-padded) → ``[G, k·F]`` (reference ``glob/sort.py``)."""
    ids, num_graphs, node_mask = _ids(graph_or_ids, num_graphs, node_mask)
    key = x[:, -1]
    neg = jnp.array(-jnp.inf, x.dtype)
    if node_mask is not None:
        key = jnp.where(node_mask, key, neg)
    order = jnp.lexsort((-key, ids))  # graph-major, key desc
    sorted_ids = ids[order]
    ones = jnp.ones(ids.shape[0], jnp.int32)
    if node_mask is not None:
        ones = jnp.where(node_mask, ones, 0)
    counts = segment_sum(ones, ids, num_graphs, indices_are_sorted=True)
    # position within graph after sort: global pos − #nodes in earlier graphs
    pos = jnp.arange(x.shape[0]) - jnp.cumsum(jnp.pad(counts, (1, 0))[:-1])[sorted_ids]
    keep = (pos < k) & (
        node_mask[order] if node_mask is not None else jnp.ones_like(pos, bool)
    )
    out = jnp.zeros((num_graphs, k, x.shape[1]), x.dtype)
    safe_pos = jnp.clip(pos, 0, k - 1)
    out = out.at[sorted_ids, safe_pos].add(
        jnp.where(keep[:, None], x[order], 0)
    )
    return out.reshape(num_graphs, k * x.shape[1])
