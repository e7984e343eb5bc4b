"""ChebConv — reference ``torch_geometric/nn/conv/cheb_conv.py``.

Chebyshev spectral convolution of order K over the scaled Laplacian
L̂ = 2L/λ_max − I with L = I − D^{-1/2} A D^{-1/2}:

    x' = Σ_k Z_k W_k,  Z_0 = x, Z_1 = L̂x, Z_k = 2 L̂ Z_{k-1} − Z_{k-2}

The recurrence is a ``lax.fori``-free static Python loop over K (K is a
hyperparameter, so unrolling is the XLA-idiomatic choice).
"""
from __future__ import annotations

from typing import Optional, Union

import flax.linen as nn
import jax.numpy as jnp

from ... import _axis_context as _pctx
from ...data.graph import Graph
from ...ops.segment import segment_sum
from ...ops.spmm import spmm_coo
from ..inits import glorot, zeros
from ..message_passing import MessagePassing, resolve_graph_args


class ChebConv(MessagePassing):
    in_channels: int
    out_channels: int
    K: int
    normalization: str = "sym"  # 'sym' supported (reference default)
    use_bias: bool = True
    lambda_max: float = 2.0

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
        (x_src, _), senders, receivers, num_nodes, edge_mask, _ = (
            resolve_graph_args(x, graph_or_senders, receivers, num_nodes, edge_mask)
        )
        if edge_weight is None:
            edge_weight = jnp.ones(senders.shape[0], x.dtype)
        if edge_mask is not None:
            edge_weight = jnp.where(edge_mask, edge_weight, 0)

        # sym-normalized -A part of L, scaled by 2/λ_max; diagonal handled densely
        deg = _pctx.cross_shard_sum(segment_sum(edge_weight, receivers, num_nodes))
        dinv = jnp.where(deg > 0, jnp.power(jnp.maximum(deg, 1e-12), -0.5), 0)
        norm_w = -dinv[senders] * edge_weight * dinv[receivers] * (2.0 / self.lambda_max)
        diag = 2.0 / self.lambda_max - 1.0  # (2/λ)·I − I contribution

        def lhat(z):
            return spmm_coo(
                z, senders, receivers, num_nodes,
                edge_weight=norm_w, edge_mask=edge_mask,
            ) + diag * z

        tx0, out = x, None
        w0 = self.param("weight_0", glorot(), (self.in_channels, self.out_channels))
        out = tx0 @ w0
        if self.K > 1:
            tx1 = lhat(x)
            w1 = self.param("weight_1", glorot(), (self.in_channels, self.out_channels))
            out = out + tx1 @ w1
            for k in range(2, self.K):
                tx2 = 2 * lhat(tx1) - tx0
                wk = self.param(
                    f"weight_{k}", glorot(), (self.in_channels, self.out_channels)
                )
                out = out + tx2 @ wk
                tx0, tx1 = tx1, tx2
        if self.use_bias:
            out = out + self.param("bias", zeros(), (self.out_channels,))
        return out
