"""Propagation-only convs: SGConv, APPNP, TAGConv, ClusterGCNConv.

References: ``torch_geometric/nn/conv/{sg_conv,appnp,tag_conv,
cluster_gcn_conv}.py``.  All share the pattern "repeated normalized
propagation + (at most one) linear map", which XLA fuses aggressively; the
propagation count K is a static hyperparameter, unrolled.
"""
from __future__ import annotations

from typing import Optional, Union

import flax.linen as nn
import jax.numpy as jnp

from ... import _axis_context as _pctx
from ...data.graph import Graph
from ...ops.norm import gcn_norm
from ...ops.segment import segment_sum
from ...ops.spmm import spmm_coo
from ..inits import kaiming_uniform, linear_bias
from ..message_passing import MessagePassing, resolve_graph_args


def _norm_propagate(x, senders, receivers, num_nodes, edge_weight, self_norm, edge_mask):
    out = spmm_coo(
        x, senders, receivers, num_nodes,
        edge_weight=edge_weight, edge_mask=edge_mask,
    )
    if self_norm is not None:
        out = out + self_norm[:, None] * x
    return out


class SGConv(MessagePassing):
    """x' = (D̂^{-1/2}ÂD̂^{-1/2})^K x W — simplified GCN (SGC)."""

    in_channels: int
    out_channels: int
    K: int = 1
    add_self_loops: bool = True
    use_bias: bool = True

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
        ew, sn = gcn_norm(
            senders, receivers, num_nodes,
            edge_weight=edge_weight, edge_mask=edge_mask,
            add_self_loops=self.add_self_loops,
        )
        for _ in range(self.K):
            x = _norm_propagate(x, senders, receivers, num_nodes, ew, sn, edge_mask)
        w = self.param("weight", kaiming_uniform(), (self.in_channels, self.out_channels))
        out = x @ w
        if self.use_bias:
            out = out + self.param(
                "bias", linear_bias(self.in_channels), (self.out_channels,)
            )
        return out


class APPNP(MessagePassing):
    """Personalized-PageRank propagation: h^{k+1} = (1−α)Âh^k + αx."""

    K: int = 10
    alpha: float = 0.1
    add_self_loops: bool = True
    dropout: float = 0.0

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
        train: bool = False,
    ) -> jnp.ndarray:
        _, senders, receivers, num_nodes, edge_mask, _ = resolve_graph_args(
            x, graph_or_senders, receivers, num_nodes, edge_mask
        )
        ew, sn = gcn_norm(
            senders, receivers, num_nodes,
            edge_weight=edge_weight, edge_mask=edge_mask,
            add_self_loops=self.add_self_loops,
        )
        h = x
        for _ in range(self.K):
            ew_k = ew
            if self.dropout > 0:
                # reference drops edges during propagation (appnp.py:64-66)
                ew_k = nn.Dropout(self.dropout, deterministic=not train)(ew)
            h = _norm_propagate(h, senders, receivers, num_nodes, ew_k, sn, edge_mask)
            h = (1 - self.alpha) * h + self.alpha * x
        return h


class TAGConv(MessagePassing):
    """Topology-adaptive GCN: x' = Σ_{k=0..K} Â^k x W_k."""

    in_channels: int
    out_channels: int
    K: int = 3
    use_bias: bool = True

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
        ew, sn = gcn_norm(
            senders, receivers, num_nodes,
            edge_weight=edge_weight, edge_mask=edge_mask,
            add_self_loops=False,
        )
        fan_in = self.in_channels * (self.K + 1)
        out = None
        h = x
        for k in range(self.K + 1):
            wk = self.param(
                f"weight_{k}", kaiming_uniform(), (self.in_channels, self.out_channels)
            )
            term = h @ wk
            out = term if out is None else out + term
            if k < self.K:
                h = _norm_propagate(h, senders, receivers, num_nodes, ew, sn, edge_mask)
        if self.use_bias:
            out = out + self.param("bias", linear_bias(fan_in), (self.out_channels,))
        return out


class ClusterGCNConv(MessagePassing):
    """Cluster-GCN conv: x' = (Â + λ·diag(Â)) x W₁ + x W₂ with
    Â = D̂^{-1} (A + I) (reference ``cluster_gcn_conv.py``)."""

    in_channels: int
    out_channels: int
    diag_lambda: float = 0.0
    add_self_loops: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        graph_or_senders: Union[Graph, jnp.ndarray],
        receivers: Optional[jnp.ndarray] = None,
        *,
        num_nodes: Optional[int] = None,
        edge_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        _, senders, receivers, num_nodes, edge_mask, _ = resolve_graph_args(
            x, graph_or_senders, receivers, num_nodes, edge_mask
        )
        ones = jnp.ones(senders.shape[0], x.dtype)
        if edge_mask is not None:
            ones = jnp.where(edge_mask, ones, 0)
        deg = _pctx.cross_shard_sum(segment_sum(ones, receivers, num_nodes)) + (
            1.0 if self.add_self_loops else 0.0
        )
        dinv = 1.0 / jnp.maximum(deg, 1)
        ew = dinv[receivers] * ones
        # self-loop weight D̂^{-1}, amplified by (1+λ) on the diagonal
        self_w = dinv * (1.0 + self.diag_lambda) if self.add_self_loops else None

        out = spmm_coo(
            x, senders, receivers, num_nodes, edge_weight=ew, edge_mask=edge_mask
        )
        if self_w is not None:
            out = out + self_w[:, None] * x
        w1 = self.param("lin_out", kaiming_uniform(), (self.in_channels, self.out_channels))
        out = out @ w1
        w2 = self.param("lin_root", kaiming_uniform(), (self.in_channels, self.out_channels))
        out = out + x @ w2
        if self.use_bias:
            out = out + self.param(
                "bias", linear_bias(self.in_channels), (self.out_channels,)
            )
        return out


class LEConv(MessagePassing):
    """Local-extremum conv (reference ``le_conv.py``; the scoring layer of
    ASAPooling): x'_i = Θ1 x_i + Σ_j w_ij (Θ2 x_i − Θ3 x_j)."""

    in_channels: int
    out_channels: int
    use_bias: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        graph_or_senders,
        receivers=None,
        *,
        num_nodes=None,
        edge_weight=None,
        edge_mask=None,
    ) -> jnp.ndarray:
        from ..message_passing import propagate

        _, senders, receivers, num_nodes, edge_mask, _ = resolve_graph_args(
            x, graph_or_senders, receivers, num_nodes, edge_mask
        )
        a = x @ self.param("lin1", kaiming_uniform(), (self.in_channels, self.out_channels))
        b = x @ self.param("lin2", kaiming_uniform(), (self.in_channels, self.out_channels))

        def message(x_j, x_i, e, w):
            # x_j carries b rows; x_i carries a rows
            d = x_i - x_j
            return d if w is None else d * w[:, None]

        out = propagate(
            (b, a), senders, receivers, num_nodes,
            message_fn=message, edge_weight=edge_weight,
            edge_mask=edge_mask, aggr="add",
        )
        w3 = self.param("lin3", kaiming_uniform(), (self.in_channels, self.out_channels))
        out = out + x @ w3
        if self.use_bias:
            out = out + self.param("bias", linear_bias(self.in_channels), (self.out_channels,))
        return out
