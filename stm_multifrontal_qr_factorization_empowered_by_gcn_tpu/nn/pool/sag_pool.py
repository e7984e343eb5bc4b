"""SAGPooling — reference ``torch_geometric/nn/pool/sag_pool.py``.

Self-attention pooling: node scores come from a GNN over the graph itself
(default GraphConv), then top-k selection reuses :func:`topk_pool` (same
static-budget semantics)."""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph import Graph
from ..conv.graph_conv import GraphConv
from .topk_pool import TopKOutput, topk_pool


class SAGPooling(nn.Module):
    in_channels: int
    ratio: float = 0.5
    gnn: Optional[Callable] = None  # scoring GNN; default GraphConv(in,1)
    multiplier_fn: Callable = jnp.tanh

    @nn.compact
    def __call__(self, g: Graph, x: Optional[jnp.ndarray] = None) -> TopKOutput:
        x = g.nodes if x is None else x
        gnn = self.gnn or GraphConv(self.in_channels, 1, name="score_gnn")
        score = gnn(x, g).reshape(-1)
        return topk_pool(
            g.replace(nodes=x), score, self.ratio, multiplier_fn=self.multiplier_fn
        )
