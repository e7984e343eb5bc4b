"""GATConv / GATv2Conv — reference ``torch_geometric/nn/conv/gat_conv.py``
(230 LoC, PyG 1.6.3 semantics).

TPU-native details:

* attention softmax over each node's incoming edges is a masked
  ``segment_softmax`` (no ragged sort);
* the default self-loop is handled *analytically*: instead of materializing
  N extra edges (which would change the static edge count), the self-edge's
  attention logit joins the per-node max/denominator in closed form and its
  contribution is added as a dense term — bit-equivalent to the reference's
  ``add_self_loops=True`` path;
* multi-head weights live as one ``[in, H*F]`` matmul (MXU-friendly).
"""
from __future__ import annotations

from typing import Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ... import _axis_context as _pctx
from ...data.graph import Graph
from ..inits import glorot, zeros
from ..message_passing import MessagePassing, resolve_graph_args


def _attend(
    logits_edge: jnp.ndarray,   # [E, H] raw edge logits
    logits_self: Optional[jnp.ndarray],  # [N, H] self-loop logits (or None)
    receivers: jnp.ndarray,
    num_nodes: int,
    edge_mask: Optional[jnp.ndarray],
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Joint softmax over {incoming edges} ∪ {analytic self loop} per node.

    Returns ``(alpha_edge [E,H], alpha_self [N,H] or None)`` summing to 1 per
    (node, head) over all contributors."""
    neg = jnp.array(-jnp.inf, logits_edge.dtype)
    masked = logits_edge
    if edge_mask is not None:
        masked = jnp.where(edge_mask[:, None], logits_edge, neg)
    seg_max = jax.ops.segment_max(masked, receivers, num_nodes)
    seg_max = _pctx.cross_shard_max(seg_max)
    if logits_self is not None:
        seg_max = jnp.maximum(seg_max, logits_self)
    seg_max = jnp.where(jnp.isneginf(seg_max), 0, seg_max)

    ex_edge = jnp.exp(logits_edge - seg_max[receivers])
    if edge_mask is not None:
        ex_edge = jnp.where(edge_mask[:, None], ex_edge, 0)
    denom = jax.ops.segment_sum(ex_edge, receivers, num_nodes)
    denom = _pctx.cross_shard_sum(denom)
    ex_self = None
    if logits_self is not None:
        ex_self = jnp.exp(logits_self - seg_max)
        denom = denom + ex_self
    denom = jnp.maximum(denom, 1e-16)
    alpha_edge = ex_edge / denom[receivers]
    alpha_self = None if ex_self is None else ex_self / denom
    return alpha_edge, alpha_self


class GATConv(MessagePassing):
    in_channels: Union[int, Tuple[int, int]]
    out_channels: int
    heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2
    dropout: float = 0.0
    add_self_loops: bool = True
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
        train: bool = False,
        attn_ell=None,
    ) -> jnp.ndarray:
        (x_src, x_dst), senders, receivers, num_nodes, edge_mask, _ = (
            resolve_graph_args(x, graph_or_senders, receivers, num_nodes, edge_mask)
        )
        h, f = self.heads, self.out_channels
        in_src, in_dst = (
            self.in_channels if isinstance(self.in_channels, tuple)
            else (self.in_channels, self.in_channels)
        )

        w_src = self.param("lin_src", glorot(), (in_src, h * f))
        w_dst = (
            w_src if (x_dst is x_src and in_src == in_dst)
            else self.param("lin_dst", glorot(), (in_dst, h * f))
        )
        g_src = (x_src @ w_src).reshape(-1, h, f)
        g_dst = (x_dst @ w_dst).reshape(-1, h, f)

        att_src = self.param("att_src", glorot(), (1, h, f))
        att_dst = self.param("att_dst", glorot(), (1, h, f))
        a_src = jnp.sum(g_src * att_src, axis=-1)  # [N, H]
        a_dst = jnp.sum(g_dst * att_dst, axis=-1)  # [N, H]

        logits_edge = jax.nn.leaky_relu(
            a_src[senders] + a_dst[receivers], self.negative_slope
        )
        logits_self = (
            jax.nn.leaky_relu(a_src + a_dst, self.negative_slope)
            if self.add_self_loops else None
        )
        alpha_edge, alpha_self = _attend(
            logits_edge, logits_self, receivers, num_nodes, edge_mask
        )
        if self.dropout > 0:
            alpha_edge = nn.Dropout(self.dropout, deterministic=not train)(alpha_edge)
            if alpha_self is not None:
                alpha_self = nn.Dropout(self.dropout, deterministic=not train)(alpha_self)

        if attn_ell is not None:
            # scatter-free fast path: precomputed (fwd, bwd) EllAttn tables
            # (ops/ell.ell_attn_pair_from_coo); not valid under edge sharding
            from ...ops.ell import spmm_ell_attn

            out = spmm_ell_attn(
                g_src, alpha_edge, attn_ell[0], attn_ell[1], senders, receivers
            )
        else:
            msg = g_src[senders] * alpha_edge[..., None]          # [E, H, F]
            out = jax.ops.segment_sum(msg, receivers, num_nodes)  # [N, H, F]
            out = _pctx.cross_shard_sum(out)
        if alpha_self is not None:
            out = out + g_src * alpha_self[..., None]

        out = out.reshape(num_nodes, h * f) if self.concat else out.mean(axis=1)
        if self.use_bias:
            out = out + self.param(
                "bias", zeros(), (h * f if self.concat else f,)
            )
        return out


class GATv2Conv(MessagePassing):
    """GATv2 (dynamic attention): logits = aᵀ LeakyReLU(W[x_i ‖ x_j])."""

    in_channels: Union[int, Tuple[int, int]]
    out_channels: int
    heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2
    dropout: float = 0.0
    add_self_loops: bool = True
    share_weights: bool = False
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
        train: bool = False,
        attn_ell=None,
    ) -> jnp.ndarray:
        (x_src, x_dst), senders, receivers, num_nodes, edge_mask, _ = (
            resolve_graph_args(x, graph_or_senders, receivers, num_nodes, edge_mask)
        )
        h, f = self.heads, self.out_channels
        in_src, in_dst = (
            self.in_channels if isinstance(self.in_channels, tuple)
            else (self.in_channels, self.in_channels)
        )
        w_l = self.param("lin_l", glorot(), (in_src, h * f))
        w_r = w_l if self.share_weights else self.param("lin_r", glorot(), (in_dst, h * f))
        g_l = (x_src @ w_l).reshape(-1, h, f)
        g_r = (x_dst @ w_r).reshape(-1, h, f)

        att = self.param("att", glorot(), (1, h, f))

        def logit(sum_lr):
            return jnp.sum(jax.nn.leaky_relu(sum_lr, self.negative_slope) * att, axis=-1)

        logits_edge = logit(g_l[senders] + g_r[receivers])
        logits_self = logit(g_l + g_r) if self.add_self_loops else None
        alpha_edge, alpha_self = _attend(
            logits_edge, logits_self, receivers, num_nodes, edge_mask
        )
        if self.dropout > 0:
            alpha_edge = nn.Dropout(self.dropout, deterministic=not train)(alpha_edge)
            if alpha_self is not None:
                alpha_self = nn.Dropout(self.dropout, deterministic=not train)(alpha_self)

        if attn_ell is not None:
            from ...ops.ell import spmm_ell_attn

            out = spmm_ell_attn(
                g_l, alpha_edge, attn_ell[0], attn_ell[1], senders, receivers
            )
        else:
            msg = g_l[senders] * alpha_edge[..., None]
            out = _pctx.cross_shard_sum(jax.ops.segment_sum(msg, receivers, num_nodes))
        if alpha_self is not None:
            out = out + g_l * alpha_self[..., None]

        out = out.reshape(num_nodes, h * f) if self.concat else out.mean(axis=1)
        if self.use_bias:
            out = out + self.param("bias", zeros(), (h * f if self.concat else f,))
        return out
