"""GCN2Conv, ARMAConv, TransformerConv — reference
``torch_geometric/nn/conv/{gcn2_conv,arma_conv,transformer_conv}.py``."""
from __future__ import annotations

import math
from typing import Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ... import _axis_context as _pctx
from ...data.graph import Graph
from ...ops.norm import gcn_norm
from ...ops.spmm import spmm_coo
from ..inits import glorot, kaiming_uniform, linear_bias, zeros
from ..message_passing import MessagePassing, resolve_graph_args
from .gat_conv import _attend


class GCN2Conv(MessagePassing):
    """GCNII layer: x' = ((1−α)Âh + αx⁰)((1−β)I + βW), β = log(θ/ℓ + 1)."""

    channels: int
    alpha: float = 0.1
    theta: Optional[float] = None
    layer: Optional[int] = None
    shared_weights: bool = True
    add_self_loops: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_0: jnp.ndarray,
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
        beta = 1.0
        if self.theta is not None and self.layer is not None:
            beta = math.log(self.theta / self.layer + 1)

        ew, sn = gcn_norm(
            senders, receivers, num_nodes,
            edge_weight=edge_weight, edge_mask=edge_mask,
            add_self_loops=self.add_self_loops,
        )
        h = spmm_coo(
            x, senders, receivers, num_nodes, edge_weight=ew, edge_mask=edge_mask
        )
        if sn is not None:
            h = h + sn[:, None] * x
        h = (1 - self.alpha) * h + self.alpha * x_0

        w1 = self.param("weight1", glorot(), (self.channels, self.channels))
        if self.shared_weights:
            return (1 - beta) * h + beta * (h @ w1)
        w2 = self.param("weight2", glorot(), (self.channels, self.channels))
        support = (1 - beta) * (1 - self.alpha) * h + beta * (h @ w1)
        initial = (1 - beta) * self.alpha * x_0 + beta * (x_0 @ w2)
        return support + initial


class ARMAConv(MessagePassing):
    """ARMA_K graph filter with T stacked GCS layers per stack:

        x̄_k^{t+1} = σ(L̂ x̄_k^t W_k^t + x V_k^t),  out = mean_k x̄_k^T

    with L̂ = D^{-1/2} A D^{-1/2} (no self loops, reference arma_conv.py).
    """

    in_channels: int
    out_channels: int
    num_stacks: int = 1
    num_layers: int = 1
    shared_weights: bool = False
    dropout: float = 0.0
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
        train: bool = False,
    ) -> jnp.ndarray:
        _, senders, receivers, num_nodes, edge_mask, _ = resolve_graph_args(
            x, graph_or_senders, receivers, num_nodes, edge_mask
        )
        ew, _ = gcn_norm(
            senders, receivers, num_nodes,
            edge_weight=edge_weight, edge_mask=edge_mask, add_self_loops=False,
        )
        outs = []
        for k in range(self.num_stacks):
            h = x
            cache = {}
            for t in range(self.num_layers):
                # t=0 has its own [in,out] weights; t>=1 share one [out,out]
                # set when shared_weights (reference arma_conv.py:62-76)
                tag = min(t, 1) if self.shared_weights else t
                if tag not in cache:
                    win = self.in_channels if t == 0 else self.out_channels
                    cache[tag] = (
                        self.param(f"W_{k}_{tag}", glorot(), (win, self.out_channels)),
                        self.param(f"V_{k}_{tag}", glorot(), (self.in_channels, self.out_channels)),
                        self.param(f"bias_{k}_{tag}", zeros(), (self.out_channels,))
                        if self.use_bias else None,
                    )
                w, v, b = cache[tag]
                prop = spmm_coo(
                    h, senders, receivers, num_nodes,
                    edge_weight=ew, edge_mask=edge_mask,
                )
                root = x
                if self.dropout > 0:
                    root = nn.Dropout(self.dropout, deterministic=not train)(root)
                h = prop @ w + root @ v
                if b is not None:
                    h = h + b
                if t < self.num_layers - 1:
                    h = nn.relu(h)
            outs.append(h)
        return jnp.mean(jnp.stack(outs, axis=0), axis=0)


class TransformerConv(MessagePassing):
    """Graph transformer (UniMP): multi-head dot-product attention over
    incoming edges, optional gated skip (reference transformer_conv.py)."""

    in_channels: Union[int, Tuple[int, int]]
    out_channels: int
    heads: int = 1
    concat: bool = True
    beta: bool = False
    dropout: float = 0.0
    edge_dim: Optional[int] = None
    root_weight: bool = True

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
        train: bool = False,
        attn_ell=None,
    ) -> jnp.ndarray:
        (x_src, x_dst), senders, receivers, num_nodes, edge_mask, g_attr = (
            resolve_graph_args(x, graph_or_senders, receivers, num_nodes, edge_mask)
        )
        edge_attr = g_attr if edge_attr is None else edge_attr
        h, f = self.heads, self.out_channels
        in_src, in_dst = (
            self.in_channels if isinstance(self.in_channels, tuple)
            else (self.in_channels, self.in_channels)
        )
        key = (x_src @ self.param("lin_key", kaiming_uniform(), (in_src, h * f))).reshape(-1, h, f)
        query = (x_dst @ self.param("lin_query", kaiming_uniform(), (in_dst, h * f))).reshape(-1, h, f)
        value = (x_src @ self.param("lin_value", kaiming_uniform(), (in_src, h * f))).reshape(-1, h, f)

        key_j = key[senders]
        val_j = value[senders]
        if edge_attr is not None and self.edge_dim is not None:
            e = (edge_attr @ self.param(
                "lin_edge", kaiming_uniform(), (self.edge_dim, h * f)
            )).reshape(-1, h, f)
            key_j = key_j + e
            val_j = val_j + e

        logits = jnp.sum(query[receivers] * key_j, axis=-1) / math.sqrt(f)  # [E,H]
        alpha, _ = _attend(logits, None, receivers, num_nodes, edge_mask)
        if self.dropout > 0:
            alpha = nn.Dropout(self.dropout, deterministic=not train)(alpha)
        use_ell = attn_ell is not None and (
            edge_attr is None or self.edge_dim is None
        )  # with edge terms the per-edge values aren't a pure node gather
        if use_ell:
            from ...ops.ell import spmm_ell_attn

            out = spmm_ell_attn(
                value, alpha, attn_ell[0], attn_ell[1], senders, receivers
            )
        else:
            out = jax.ops.segment_sum(val_j * alpha[..., None], receivers, num_nodes)
            out = _pctx.cross_shard_sum(out)

        out = out.reshape(num_nodes, h * f) if self.concat else out.mean(axis=1)
        if self.root_weight and x_dst is not None:
            skip_dim = h * f if self.concat else f
            x_r = x_dst @ self.param(
                "lin_skip", kaiming_uniform(), (in_dst, skip_dim)
            ) + self.param("skip_bias", linear_bias(in_dst), (skip_dim,))
            if self.beta:
                wb = self.param("lin_beta", kaiming_uniform(), (3 * skip_dim, 1))
                b = nn.sigmoid(
                    jnp.concatenate([out, x_r, out - x_r], axis=-1) @ wb
                )
                out = b * x_r + (1 - b) * out
            else:
                out = out + x_r
        return out
