"""SAGEConv — reference ``torch_geometric/nn/conv/sage_conv.py:11-84``.

``x'_i = W1 x_i + W2 · mean_{j∈N(i)} x_j``, optional L2 output normalization.
Supports bipartite ``(x_src, x_dst)`` inputs for sampled blocks, which is how
the reference's distributed GraphSAGE consumes NeighborSampler output
(``examples/multi_gpu/distributed_sampling.py:27-34``).
"""
from __future__ import annotations

from typing import Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph import Graph
from ...data.sampler import BipartiteBlock
from ..inits import kaiming_uniform, linear_bias
from ..message_passing import MessagePassing, propagate


class SAGEConv(MessagePassing):
    in_channels: Union[int, Tuple[int, int]]
    out_channels: int
    normalize: bool = False
    use_bias: bool = True
    root_weight: bool = True
    aggr: str = "mean"
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
        plan=None,
    ) -> jnp.ndarray:
        block = None
        if isinstance(graph_or_senders, BipartiteBlock):
            # Sampler blocks have a REGULAR layout (sample_block:
            # senders = num_dst + arange(num_dst*fanout), receivers =
            # repeat(arange(num_dst), fanout)), so neighbor aggregation is
            # a reshape + masked reduction over the fanout axis — no
            # scatter, no gather.  XLA's scatter path on the same edges is
            # ~10x slower; this is the sampled-SAGE hot loop
            # (examples/multi_gpu/distributed_sampling.py:27-34).
            block = graph_or_senders
            senders, receivers = block.senders, block.receivers
            num_nodes = block.num_dst if num_nodes is None else num_nodes
            edge_mask = block.edge_mask if edge_mask is None else edge_mask
        elif isinstance(graph_or_senders, Graph):
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

        if plan is not None:
            # fast path (ops/plan.py); for the default mean aggregation build
            # with build_mean_plan so 1/deg is baked into the weights
            out = plan.apply(x_pair[0])
        elif (block is not None
              and self.aggr in ("mean", "add", "sum", "max")
              and getattr(block, "regular_layout", False)
              and block.senders.shape[0] % block.num_dst == 0):
            # The reshape path is only valid for sample_block output
            # (regular_layout=True); hand-built irregular blocks fall
            # through to the generic scatter path below.
            b = int(block.num_dst)
            fanout = block.senders.shape[0] // b
            nb = x_pair[0][b : b + b * fanout].reshape(b, fanout, -1)
            m = edge_mask.reshape(b, fanout, 1)
            if self.aggr == "mean":
                out = (nb * m).sum(axis=1) / jnp.maximum(
                    m.sum(axis=1), 1.0)
            elif self.aggr in ("add", "sum"):
                out = (nb * m).sum(axis=1)
            else:  # max
                out = jnp.where(
                    m, nb, -jnp.inf).max(axis=1)
                out = jnp.where(jnp.isfinite(out), out, 0.0)
        else:
            out = propagate(
                x_pair,
                senders,
                receivers,
                num_nodes,
                edge_mask=edge_mask,
                aggr=self.aggr,
                indices_are_sorted=self.indices_are_sorted,
            )
        w_l = self.param("lin_l_weight", kaiming_uniform(), (in_src, self.out_channels))
        out = out @ w_l
        if self.use_bias:
            out = out + self.param("lin_l_bias", linear_bias(in_src), (self.out_channels,))

        x_r = x_pair[1]
        if self.root_weight and x_r is not None:
            w_r = self.param("lin_r_weight", kaiming_uniform(), (in_dst, self.out_channels))
            out = out + x_r @ w_r

        if self.normalize:
            norm = jnp.linalg.norm(out, axis=-1, keepdims=True)
            out = out / jnp.maximum(norm, 1e-12)
        return out
