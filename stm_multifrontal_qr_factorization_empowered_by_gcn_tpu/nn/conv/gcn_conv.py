"""GCNConv — reference ``torch_geometric/nn/conv/gcn_conv.py:68-197``.

Computes ``X' = D̂^{-1/2}(A + I)D̂^{-1/2} X W + b``.  TPU-native details:

* self-loops are applied analytically (see ``ops/norm.gcn_norm``), keeping
  the edge count static;
* the node-feature matmul ``X W`` runs first so the SpMM moves the smaller of
  (in, out) feature width — same trick as the reference's ``lin`` before
  ``propagate`` (``gcn_conv.py:172-181``);
* ``norm='precomputed'`` callers can pass cached ``(edge_norm, self_norm)``,
  the analog of the reference's ``cached=True``.
"""
from __future__ import annotations

from typing import Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph import Graph
from ...ops.norm import gcn_norm
from ...ops.spmm import spmm_coo, spmm_dense
from ..inits import glorot, zeros
from ..message_passing import MessagePassing


class GCNConv(MessagePassing):
    in_channels: int
    out_channels: int
    improved: bool = False
    add_self_loops: bool = True
    normalize: bool = True
    use_bias: bool = True
    fused_dense: bool = False  # dense-adjacency MXU path for small graphs
    indices_are_sorted: bool = False

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
        precomputed_norm: Optional[Tuple[jnp.ndarray, Optional[jnp.ndarray]]] = None,
        plan=None,
        plan_self_norm: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if isinstance(graph_or_senders, Graph):
            g = graph_or_senders
            senders, receivers = g.senders, g.receivers
            num_nodes = g.num_nodes
            edge_mask = g.edge_mask() if edge_mask is None else edge_mask
        else:
            senders = graph_or_senders
            num_nodes = x.shape[0] if num_nodes is None else num_nodes

        w = self.param("weight", glorot(), (self.in_channels, self.out_channels))
        x = x @ w

        if plan is not None:
            # structure-analyzed fast path (ops/plan.build_gcn_plan): the
            # normalization is baked into the plan weights, the analytic
            # self-loop term arrives as plan_self_norm
            out = plan.apply(x)
            if plan_self_norm is not None:
                out = out + plan_self_norm[:, None] * x
            if self.use_bias:
                out = out + self.param("bias", zeros(), (self.out_channels,))
            return out

        self_norm = None
        if self.normalize:
            if precomputed_norm is not None:
                edge_weight, self_norm = precomputed_norm
            else:
                edge_weight, self_norm = gcn_norm(
                    senders,
                    receivers,
                    num_nodes,
                    edge_weight=edge_weight,
                    edge_mask=edge_mask,
                    add_self_loops=self.add_self_loops,
                    improved=self.improved,
                    indices_are_sorted=self.indices_are_sorted,
                )

        spmm = spmm_dense if self.fused_dense else spmm_coo
        out = spmm(
            x,
            senders,
            receivers,
            num_nodes,
            edge_weight=edge_weight,
            edge_mask=edge_mask,
            aggr="add",
        )
        if self_norm is not None:
            out = out + self_norm[:, None] * x
        if self.use_bias:
            out = out + self.param("bias", zeros(), (self.out_channels,))
        return out
