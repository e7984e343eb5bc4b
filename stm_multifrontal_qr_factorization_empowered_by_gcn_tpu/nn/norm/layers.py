"""Normalization layers — reference ``torch_geometric/nn/norm/*`` (368 LoC):
BatchNorm, LayerNorm (graph-wise), InstanceNorm, GraphSizeNorm, PairNorm,
MessageNorm.  All are masked/segment-aware so padded batches normalize over
valid nodes only — the padding-correctness twist the reference doesn't need.
"""
from __future__ import annotations

from typing import Optional, Union

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph import Graph
from ...ops.segment import segment_mean, segment_sum


def _ids_mask(graph_or_ids, num_graphs, node_mask):
    if isinstance(graph_or_ids, Graph):
        g = graph_or_ids
        return g.node_graph_ids(), g.num_graphs, g.node_mask()
    if num_graphs is None:
        raise ValueError("num_graphs required with raw ids")
    return graph_or_ids, num_graphs, node_mask


class BatchNorm(nn.Module):
    """Feature-wise batch norm over all valid nodes in the batch
    (reference ``norm/batch_norm.py`` = torch.nn.BatchNorm1d)."""

    num_features: int
    eps: float = 1e-5
    momentum: float = 0.1
    affine: bool = True
    track_running_stats: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        *,
        node_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.num_features)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.num_features)
        )
        if train or not self.track_running_stats:
            if node_mask is None:
                mean = jnp.mean(x, axis=0)
                var = jnp.var(x, axis=0)
            else:
                m = node_mask[:, None].astype(x.dtype)
                cnt = jnp.maximum(jnp.sum(m), 1)
                mean = jnp.sum(x * m, axis=0) / cnt
                var = jnp.sum(((x - mean) ** 2) * m, axis=0) / cnt
            if self.track_running_stats and not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * var
        else:
            mean, var = ra_mean.value, ra_var.value
        out = (x - mean) / jnp.sqrt(var + self.eps)
        if self.affine:
            out = out * self.param("scale", nn.initializers.ones, (self.num_features,))
            out = out + self.param("bias", nn.initializers.zeros, (self.num_features,))
        return out


class LayerNorm(nn.Module):
    """Graph-wise layer norm: normalize each graph's node features jointly
    (reference ``norm/layer_norm.py``)."""

    num_features: int
    eps: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        graph_or_ids: Union[Graph, jnp.ndarray, None] = None,
        *,
        num_graphs: Optional[int] = None,
        node_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if graph_or_ids is None:
            mean = jnp.mean(x)
            var = jnp.mean((x - mean) ** 2)
            out = (x - mean) / jnp.sqrt(var + self.eps)
        else:
            ids, num_graphs, node_mask = _ids_mask(graph_or_ids, num_graphs, node_mask)
            feat_mean = segment_mean(x, ids, num_graphs, mask=node_mask)  # [G,F]
            mean = jnp.mean(feat_mean, axis=1, keepdims=True)             # [G,1]
            centered = x - mean[ids]
            sq = segment_mean(centered**2, ids, num_graphs, mask=node_mask)
            var = jnp.mean(sq, axis=1, keepdims=True)
            out = centered / jnp.sqrt(var + self.eps)[ids]
            if node_mask is not None:
                out = jnp.where(node_mask[:, None], out, 0)
        if self.affine:
            out = out * self.param("scale", nn.initializers.ones, (self.num_features,))
            out = out + self.param("bias", nn.initializers.zeros, (self.num_features,))
        return out


class InstanceNorm(nn.Module):
    """Per-graph, per-feature norm (reference ``norm/instance_norm.py``)."""

    num_features: int
    eps: float = 1e-5
    affine: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        graph_or_ids: Union[Graph, jnp.ndarray],
        *,
        num_graphs: Optional[int] = None,
        node_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        ids, num_graphs, node_mask = _ids_mask(graph_or_ids, num_graphs, node_mask)
        mean = segment_mean(x, ids, num_graphs, mask=node_mask)
        centered = x - mean[ids]
        var = segment_mean(centered**2, ids, num_graphs, mask=node_mask)
        out = centered / jnp.sqrt(var + self.eps)[ids]
        if node_mask is not None:
            out = jnp.where(node_mask[:, None], out, 0)
        if self.affine:
            out = out * self.param("scale", nn.initializers.ones, (self.num_features,))
            out = out + self.param("bias", nn.initializers.zeros, (self.num_features,))
        return out


class GraphSizeNorm(nn.Module):
    """x_i / sqrt(|V_g|) (reference ``norm/graph_size_norm.py``)."""

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        graph_or_ids: Union[Graph, jnp.ndarray],
        *,
        num_graphs: Optional[int] = None,
        node_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if isinstance(graph_or_ids, Graph):
            g = graph_or_ids
            ids = g.node_graph_ids()
            inv_sqrt = 1.0 / jnp.sqrt(jnp.maximum(g.n_node.astype(x.dtype), 1))
            return x * inv_sqrt[ids][:, None]
        ids = graph_or_ids
        ones = jnp.ones(ids.shape[0], x.dtype)
        if node_mask is not None:
            ones = jnp.where(node_mask, ones, 0)
        counts = segment_sum(ones, ids, num_graphs)
        inv_sqrt = 1.0 / jnp.sqrt(jnp.maximum(counts, 1))
        return x * inv_sqrt[ids][:, None]


class PairNorm(nn.Module):
    """PairNorm (reference ``norm/pair_norm.py``): center per graph, then
    rescale rows to constant average norm."""

    scale: float = 1.0
    scale_individually: bool = False
    eps: float = 1e-5

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        graph_or_ids: Union[Graph, jnp.ndarray, None] = None,
        *,
        num_graphs: Optional[int] = None,
        node_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if graph_or_ids is None:
            x = x - jnp.mean(x, axis=0)
            if self.scale_individually:
                return self.scale * x / jnp.sqrt(
                    self.eps + jnp.sum(x**2, axis=-1, keepdims=True)
                )
            return self.scale * x / jnp.sqrt(
                self.eps + jnp.mean(jnp.sum(x**2, axis=-1))
            )
        ids, num_graphs, node_mask = _ids_mask(graph_or_ids, num_graphs, node_mask)
        mean = segment_mean(x, ids, num_graphs, mask=node_mask)
        x = x - mean[ids]
        if node_mask is not None:
            x = jnp.where(node_mask[:, None], x, 0)
        if self.scale_individually:
            return self.scale * x / jnp.sqrt(
                self.eps + jnp.sum(x**2, axis=-1, keepdims=True)
            )
        msq = segment_mean(
            jnp.sum(x**2, axis=-1, keepdims=True), ids, num_graphs, mask=node_mask
        )
        return self.scale * x / jnp.sqrt(self.eps + msq)[ids]


class MessageNorm(nn.Module):
    """MsgNorm (reference ``norm/msg_norm.py``): scale messages to the node
    feature norm."""

    learn_scale: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, msg: jnp.ndarray, p: int = 2) -> jnp.ndarray:
        msg = msg / jnp.maximum(
            jnp.linalg.norm(msg, ord=p, axis=-1, keepdims=True), 1e-12
        )
        x_norm = jnp.linalg.norm(x, ord=p, axis=-1, keepdims=True)
        scale = (
            self.param("scale", nn.initializers.ones, (1,))
            if self.learn_scale else 1.0
        )
        return msg * x_norm * scale
