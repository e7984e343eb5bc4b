"""GraphConv — reference ``torch_geometric/nn/conv/graph_conv.py:10-81``.

``x'_i = Θ1 x_i + Θ2 · aggr_{j∈N(i)} e_{j,i} x_j`` (Weisfeiler-Leman GNN).
This is the layer used by the flagship reorder classifier
(``GCN_classifier/graphclass.py:65-67``).  Note the reference applies
``lin_l`` *after* aggregation (``graph_conv.py:55-70``) — we keep that order
so loaded reference weights produce identical activations.
"""
from __future__ import annotations

from typing import Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph import Graph
from ..inits import kaiming_uniform, linear_bias
from ..message_passing import MessagePassing, propagate


class GraphConv(MessagePassing):
    in_channels: Union[int, Tuple[int, int]]
    out_channels: int
    aggr: str = "add"
    use_bias: bool = True
    indices_are_sorted: bool = False

    @nn.compact
    def __call__(
        self,
        x: Union[jnp.ndarray, Tuple[jnp.ndarray, Optional[jnp.ndarray]]],
        graph_or_senders: Union[Graph, jnp.ndarray],
        receivers: Optional[jnp.ndarray] = None,
        *,
        num_nodes: Optional[int] = None,
        edge_weight: Optional[jnp.ndarray] = None,
        edge_mask: Optional[jnp.ndarray] = None,
        ell_pair=None,
        plan=None,
    ) -> jnp.ndarray:
        if isinstance(graph_or_senders, Graph):
            g = graph_or_senders
            senders, receivers = g.senders, g.receivers
            num_nodes = g.num_nodes if num_nodes is None else num_nodes
            edge_mask = g.edge_mask() if edge_mask is None else edge_mask
        else:
            senders = graph_or_senders

        x_pair = x if isinstance(x, tuple) else (x, x)
        if num_nodes is None:
            num_nodes = x_pair[1].shape[0]

        in_src, in_dst = (
            self.in_channels
            if isinstance(self.in_channels, tuple)
            else (self.in_channels, self.in_channels)
        )

        if plan is not None and self.aggr in ("add", "sum") and edge_weight is None:
            # structure-analyzed fast path (ops/plan.py): BSR MXU blocks +
            # tight-ELL residual, weights baked at build time
            out = plan.apply(x_pair[0])
        elif ell_pair is not None and self.aggr in ("add", "sum") and edge_weight is None:
            # scatter-free fast path: precomputed (fwd, transpose) ELL tables
            # (ops/ell.py); the transpose drives the backward SpMM
            from ...ops.ell import spmm_ell

            out = spmm_ell(x_pair[0], *ell_pair)
        else:
            out = propagate(
                x_pair,
                senders,
                receivers,
                num_nodes,
                edge_weight=edge_weight,
                edge_mask=edge_mask,
                aggr=self.aggr,
                indices_are_sorted=self.indices_are_sorted,
            )
        # lin_l: aggregated neighbours (bias lives here, like torch Linear)
        w_l = self.param("lin_l_weight", kaiming_uniform(), (in_src, self.out_channels))
        out = out @ w_l
        if self.use_bias:
            out = out + self.param("lin_l_bias", linear_bias(in_src), (self.out_channels,))
        # lin_r: root/self term, no bias (reference graph_conv.py:47)
        x_r = x_pair[1]
        if x_r is not None:
            w_r = self.param("lin_r_weight", kaiming_uniform(), (in_dst, self.out_channels))
            out = out + x_r @ w_r
        return out
