"""MetaLayer + knn_interpolate — reference ``torch_geometric/nn/meta.py`` and
``nn/unpool/knn_interpolate.py``.

``MetaLayer`` is the full Graph-Networks block (Battaglia et al. 2018):
edge → node → global update, each an arbitrary flax callable.
``knn_interpolate`` is PointNet++'s inverse-distance feature upsampling
(the decoder-side unpool).  Both are padding-mask aware.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.segment import segment_mean, segment_sum
from ..utils.knn import knn


class MetaLayer(nn.Module):
    """reference ``meta.py:4-120``.

    * ``edge_model(src, dst, edge_attr, u, batch_e)`` → new edge_attr
    * ``node_model(x, senders, receivers, edge_attr, u, batch_n)`` → new x
    * ``global_model(x, senders, receivers, edge_attr, u, batch_n)`` → new u
    """

    edge_model: Optional[Callable] = None
    node_model: Optional[Callable] = None
    global_model: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, senders, receivers, edge_attr=None, u=None,
                 batch=None) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        if self.edge_model is not None:
            batch_e = None if batch is None else batch[senders]
            edge_attr = self.edge_model(
                x[senders], x[receivers], edge_attr, u, batch_e)
        if self.node_model is not None:
            x = self.node_model(x, senders, receivers, edge_attr, u, batch)
        if self.global_model is not None:
            u = self.global_model(x, senders, receivers, edge_attr, u, batch)
        return x, edge_attr, u


def knn_interpolate(x, pos_x, pos_y, batch_x=None, batch_y=None, k: int = 3,
                    mask_x=None):
    """reference ``unpool/knn_interpolate.py:6-55`` — inverse-squared-distance
    weighted average of each target point's k nearest source features."""
    idx, sqd = knn(pos_x, pos_y, k, batch_src=batch_x, batch_dst=batch_y,
                   mask_src=mask_x)                     # [M, k]
    w = 1.0 / jnp.clip(sqd, 1e-16, None)                # [M, k]
    feats = x[idx]                                      # [M, k, F]
    return (w[..., None] * feats).sum(1) / w.sum(1, keepdims=True)
