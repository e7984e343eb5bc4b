"""EdgeConv, NNConv, GatedGraphConv, ResGatedGraphConv — reference
``torch_geometric/nn/conv/{edge_conv,nn_conv,gated_graph_conv,
res_gated_graph_conv}.py``."""
from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph import Graph
from ..inits import kaiming_uniform, linear_bias, uniform
from ..message_passing import MessagePassing, propagate, resolve_graph_args


class EdgeConv(MessagePassing):
    """x'_i = max_j MLP([x_i ‖ x_j − x_i]) (DGCNN)."""

    mlp: Callable
    aggr: str = "max"

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

        def message(x_j, x_i, e, w):
            return self.mlp(jnp.concatenate([x_i, x_j - x_i], axis=-1))

        return propagate(
            x_pair, senders, receivers, num_nodes,
            message_fn=message, edge_mask=edge_mask, aggr=self.aggr,
        )


class DynamicEdgeConv(MessagePassing):
    """EdgeConv over a k-NN graph rebuilt **in feature space** every forward
    (DGCNN's dynamic graph) — reference
    ``torch_geometric/nn/conv/edge_conv.py:60-97``.

    The reference calls torch-cluster's ``knn(x, x, k)`` per forward; here
    the rebuild is the on-device ``utils.knn.knn`` (masked dense top-k —
    static shapes, jit-safe), so the layer composes under ``jit``/``grad``
    like any other conv.  Bipartite ``(x_src, x_dst)`` pairs follow the
    reference semantics: neighbors searched in ``x_src``, centers are
    ``x_dst``.  ``batch`` (or a ``(batch_src, batch_dst)`` pair) confines
    neighbors to the same graph; ``mask`` hides padding nodes.
    """

    mlp: Callable
    k: int
    aggr: str = "max"

    @nn.compact
    def __call__(
        self,
        x: Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]],
        batch: Optional[Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]] = None,
        *,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        from ...utils.knn import knn

        x_src, x_dst = x if isinstance(x, tuple) else (x, x)
        b_src, b_dst = (
            batch if isinstance(batch, tuple) else (batch, batch)
        )
        idx, _ = knn(x_src, x_dst, self.k, b_src, b_dst, mask_src=mask)
        n_dst = x_dst.shape[0]
        receivers = jnp.repeat(jnp.arange(n_dst, dtype=jnp.int32), self.k)
        senders = idx.reshape(-1).astype(jnp.int32)

        def message(x_j, x_i, e, w):
            return self.mlp(jnp.concatenate([x_i, x_j - x_i], axis=-1))

        edge_mask = mask[senders] if mask is not None else None
        return propagate(
            (x_src, x_dst), senders, receivers, n_dst,
            message_fn=message, edge_mask=edge_mask, aggr=self.aggr,
        )


class NNConv(MessagePassing):
    """Edge-conditioned conv: x'_i = x_i W_root + Σ_j x_j · MLP(e_ji)."""

    in_channels: int
    out_channels: int
    edge_mlp: Callable  # maps edge_attr -> in_channels * out_channels
    aggr: str = "add"
    root_weight: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        graph_or_senders: Union[Graph, jnp.ndarray],
        receivers: Optional[jnp.ndarray] = None,
        *,
        edge_attr: Optional[jnp.ndarray] = None,
        num_nodes: Optional[int] = None,
        edge_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        x_pair, senders, receivers, num_nodes, edge_mask, g_attr = resolve_graph_args(
            x, graph_or_senders, receivers, num_nodes, edge_mask
        )
        edge_attr = g_attr if edge_attr is None else edge_attr
        if edge_attr is None:
            raise ValueError("NNConv requires edge_attr")
        theta = self.edge_mlp(edge_attr).reshape(
            -1, self.in_channels, self.out_channels
        )

        def message(x_j, x_i, e, w):
            return jnp.einsum("ei,eio->eo", x_j, theta)

        out = propagate(
            x_pair, senders, receivers, num_nodes,
            message_fn=message, edge_mask=edge_mask, aggr=self.aggr,
        )
        x_r = x_pair[1]
        if self.root_weight and x_r is not None:
            w_root = self.param(
                "root", uniform(self.in_channels), (self.in_channels, self.out_channels)
            )
            out = out + x_r @ w_root
        if self.use_bias:
            out = out + self.param("bias", uniform(self.in_channels), (self.out_channels,))
        return out


class GatedGraphConv(MessagePassing):
    """GGNN: h^{k+1} = GRU(Σ_j W h_j^k, h^k), K layers share the GRU."""

    out_channels: int
    num_layers: int
    aggr: str = "add"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        graph_or_senders: Union[Graph, jnp.ndarray],
        receivers: Optional[jnp.ndarray] = None,
        *,
        num_nodes: Optional[int] = None,
        edge_weight: Optional[jnp.ndarray] = None,
        edge_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        _, senders, receivers, num_nodes, edge_mask, _ = resolve_graph_args(
            x, graph_or_senders, receivers, num_nodes, edge_mask
        )
        f = self.out_channels
        if x.shape[-1] > f:
            raise ValueError("input dim must be <= out_channels (reference check)")
        if x.shape[-1] < f:
            x = jnp.pad(x, [(0, 0), (0, f - x.shape[-1])])

        gru = nn.GRUCell(features=f)
        h = x
        for k in range(self.num_layers):
            wk = self.param(f"weight_{k}", uniform(f), (f, f))
            m = propagate(
                h @ wk, senders, receivers, num_nodes,
                edge_weight=edge_weight, edge_mask=edge_mask, aggr=self.aggr,
            )
            h, _ = gru(h, m)
        return h


class ResGatedGraphConv(MessagePassing):
    """x'_i = W₁x_i + Σ_j σ(W₃x_i + W₄x_j) ⊙ W₂x_j (gated residual)."""

    in_channels: int
    out_channels: int
    use_bias: bool = True

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
        x_src, x_dst = x_pair
        k = self.param("lin_key", kaiming_uniform(), (self.in_channels, self.out_channels))
        q = self.param("lin_query", kaiming_uniform(), (self.in_channels, self.out_channels))
        v = self.param("lin_value", kaiming_uniform(), (self.in_channels, self.out_channels))
        key_i = x_dst @ k
        query_j = x_src @ q
        val_j = x_src @ v

        def message(q_j, k_i, e, w):
            # q_j carries [query ‖ value] stacked on the feature axis
            qj, vj = jnp.split(q_j, 2, axis=-1)
            return nn.sigmoid(k_i + qj) * vj

        out = propagate(
            (jnp.concatenate([query_j, val_j], axis=-1), key_i),
            senders, receivers, num_nodes,
            message_fn=message, edge_mask=edge_mask, aggr="add",
        )
        w_skip = self.param(
            "lin_skip", kaiming_uniform(), (self.in_channels, self.out_channels)
        )
        out = out + x_dst @ w_skip
        if self.use_bias:
            out = out + self.param(
                "bias", linear_bias(self.in_channels), (self.out_channels,)
            )
        return out
