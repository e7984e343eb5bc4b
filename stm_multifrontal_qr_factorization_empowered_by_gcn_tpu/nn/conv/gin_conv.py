"""GINConv / GINEConv — reference ``torch_geometric/nn/conv/gin_conv.py``.

``x'_i = MLP((1+ε)·x_i + Σ_j x_j)``; GINE adds edge features inside the sum:
``Σ_j ReLU(x_j + e_ji)``.  ε is a learnable scalar when ``train_eps``.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph import Graph
from ..message_passing import MessagePassing, propagate, resolve_graph_args


class GINConv(MessagePassing):
    mlp: Callable  # flax Module applied to the aggregated features
    eps: float = 0.0
    train_eps: bool = False
    indices_are_sorted: bool = False

    @nn.compact
    def __call__(
        self,
        x: Union[jnp.ndarray, Tuple[jnp.ndarray, Optional[jnp.ndarray]]],
        graph_or_senders: Union[Graph, jnp.ndarray],
        receivers: Optional[jnp.ndarray] = None,
        *,
        num_nodes: Optional[int] = None,
        edge_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        x_pair, senders, receivers, num_nodes, edge_mask, _ = resolve_graph_args(
            x, graph_or_senders, receivers, num_nodes, edge_mask
        )
        out = propagate(
            x_pair, senders, receivers, num_nodes,
            edge_mask=edge_mask, aggr="add",
            indices_are_sorted=self.indices_are_sorted,
        )
        eps = (
            self.param("eps", lambda *_: jnp.asarray(self.eps))
            if self.train_eps else self.eps
        )
        x_r = x_pair[1]
        if x_r is not None:
            out = out + (1 + eps) * x_r
        return self.mlp(out)


class GINEConv(MessagePassing):
    mlp: Callable
    eps: float = 0.0
    train_eps: bool = False
    edge_dim: Optional[int] = None  # project edge_attr to node dim when set
    node_dim: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        x: Union[jnp.ndarray, Tuple[jnp.ndarray, Optional[jnp.ndarray]]],
        graph_or_senders: Union[Graph, jnp.ndarray],
        receivers: Optional[jnp.ndarray] = None,
        *,
        edge_attr: Optional[jnp.ndarray] = None,
        num_nodes: Optional[int] = None,
        edge_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        x_pair, senders, receivers, num_nodes, edge_mask, g_edge_attr = (
            resolve_graph_args(x, graph_or_senders, receivers, num_nodes, edge_mask)
        )
        if edge_attr is None:
            edge_attr = g_edge_attr
        if edge_attr is None:
            raise ValueError("GINEConv requires edge_attr")
        if self.edge_dim is not None:
            edge_attr = nn.Dense(self.node_dim or x_pair[0].shape[-1])(edge_attr)

        def message(x_j, x_i, e, w):
            return nn.relu(x_j + e)

        out = propagate(
            x_pair, senders, receivers, num_nodes,
            message_fn=message, edge_attr=edge_attr,
            edge_mask=edge_mask, aggr="add",
        )
        eps = (
            self.param("eps", lambda *_: jnp.asarray(self.eps))
            if self.train_eps else self.eps
        )
        x_r = x_pair[1]
        if x_r is not None:
            out = out + (1 + eps) * x_r
        return self.mlp(out)
