"""AGNNConv and PNAConv — reference ``torch_geometric/nn/conv/{agnn_conv,
pna_conv}.py``."""
from __future__ import annotations

from typing import Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ... import _axis_context as _pctx
from ...data.graph import Graph
from ...ops.segment import segment_count, segment_softmax
from ..inits import kaiming_uniform, linear_bias
from ..message_passing import MessagePassing, propagate, resolve_graph_args


class AGNNConv(MessagePassing):
    """Attention-based GNN: α_e = softmax(β · cos(x_i, x_j)) over incoming
    edges; x'_i = Σ α_e x_j."""

    requires_grad: bool = True
    add_self_loops: bool = True

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
        beta = (
            self.param("beta", nn.initializers.ones, (1,))
            if self.requires_grad else jnp.ones(1, x.dtype)
        )
        xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        logits = beta * jnp.sum(xn[senders] * xn[receivers], axis=-1)  # [E]

        if self.add_self_loops:
            # analytic self loop (cos(x,x)=1): joins max & denominator densely
            self_logit = beta[0] * jnp.ones(num_nodes, x.dtype)
            neg = jnp.array(-jnp.inf, x.dtype)
            ml = jnp.where(edge_mask, logits, neg) if edge_mask is not None else logits
            seg_max = _pctx.cross_shard_max(
                jax.ops.segment_max(ml, receivers, num_nodes)
            )
            seg_max = jnp.maximum(jnp.where(jnp.isneginf(seg_max), 0, seg_max), self_logit)
            ex = jnp.exp(logits - seg_max[receivers])
            if edge_mask is not None:
                ex = jnp.where(edge_mask, ex, 0)
            denom = _pctx.cross_shard_sum(
                jax.ops.segment_sum(ex, receivers, num_nodes)
            ) + jnp.exp(self_logit - seg_max)
            alpha = ex / jnp.maximum(denom[receivers], 1e-16)
            out = _pctx.cross_shard_sum(
                jax.ops.segment_sum(x[senders] * alpha[:, None], receivers, num_nodes)
            )
            alpha_self = jnp.exp(self_logit - seg_max) / jnp.maximum(denom, 1e-16)
            return out + alpha_self[:, None] * x
        alpha = segment_softmax(logits, receivers, num_nodes, mask=edge_mask)
        return propagate(
            x, senders, receivers, num_nodes,
            edge_weight=alpha, edge_mask=edge_mask,
        )


class PNAConv(MessagePassing):
    """Principal Neighbourhood Aggregation: multiple aggregators × degree
    scalers, concatenated and projected (reference ``pna_conv.py``)."""

    in_channels: int
    out_channels: int
    aggregators: Sequence[str] = ("mean", "min", "max", "std")
    scalers: Sequence[str] = ("identity", "amplification", "attenuation")
    deg_avg_log: float = 1.0  # avg of log(deg+1) over the training graphs
    towers: int = 1
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
        h = x @ self.param(
            "pre", kaiming_uniform(), (self.in_channels, self.out_channels)
        )
        outs = []
        mean = propagate(
            h, senders, receivers, num_nodes, edge_mask=edge_mask, aggr="mean"
        )
        for aggr in self.aggregators:
            if aggr == "mean":
                outs.append(mean)
            elif aggr == "std":
                sq = propagate(
                    h * h, senders, receivers, num_nodes,
                    edge_mask=edge_mask, aggr="mean",
                )
                outs.append(jnp.sqrt(jnp.maximum(sq - mean**2, 0) + 1e-5))
            else:
                outs.append(
                    propagate(
                        h, senders, receivers, num_nodes,
                        edge_mask=edge_mask, aggr=aggr,
                    )
                )
        stacked = jnp.concatenate(outs, axis=-1)  # [N, A*F]

        deg = segment_count(receivers, num_nodes, mask=edge_mask, dtype=jnp.float32)
        log_deg = jnp.log(deg + 1)
        scaled = []
        for s in self.scalers:
            if s == "identity":
                scaled.append(stacked)
            elif s == "amplification":
                scaled.append(stacked * (log_deg / self.deg_avg_log)[:, None])
            elif s == "attenuation":
                scaled.append(
                    stacked * (self.deg_avg_log / jnp.maximum(log_deg, 1e-5))[:, None]
                )
            else:
                raise ValueError(f"unknown scaler {s!r}")
        feats = jnp.concatenate(scaled, axis=-1)  # [N, S*A*F]

        fan_in = len(self.scalers) * len(self.aggregators) * self.out_channels
        out = feats @ self.param(
            "post", kaiming_uniform(), (fan_in, self.out_channels)
        )
        if self.use_bias:
            out = out + self.param("bias", linear_bias(fan_in), (self.out_channels,))
        return out
