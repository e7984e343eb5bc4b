"""Node-scoring reordering net — reference ``GCN_classifier/testsage.py:31-84``
(`sage.py` is its fully-commented-out training twin, SURVEY.md §2.1 P3).

Architecture: degree → Embedding(100, embed_dim) → GCNConv(embed_dim, 128) →
ReLU → dropout(0.5) → GCNConv(128, 128) → ReLU → Linear(128, 1) → sigmoid.
Output: per-node score in (0,1); the predicted elimination order is the
argsort of scores (reference ``saveall``, ``testsage.py:102-127``).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..data.graph import Graph
from ..nn.conv.gcn_conv import GCNConv


class SageOrderNet(nn.Module):
    embed_dim: int = 10
    hidden: int = 128
    num_embeddings: int = 100
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, g: Graph, *, train: bool = False) -> jnp.ndarray:
        deg = jnp.clip(g.nodes[:, 0].astype(jnp.int32), 0, self.num_embeddings - 1)
        x = nn.Embed(self.num_embeddings, self.embed_dim, name="item_embedding")(deg)
        x = nn.relu(GCNConv(self.embed_dim, self.hidden, name="conv1")(x, g))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.relu(GCNConv(self.hidden, self.hidden, name="conv2")(x, g))
        score = nn.Dense(1, name="lin3")(x)[:, 0]
        return nn.sigmoid(score)


def order_mse_loss(scores: jnp.ndarray, g: Graph) -> jnp.ndarray:
    """MSE to the normalized order labels over valid nodes."""
    mask = g.node_mask().astype(scores.dtype)
    y = g.y.reshape(-1)
    return jnp.sum(((scores - y) ** 2) * mask) / jnp.maximum(jnp.sum(mask), 1)


def order_position_accuracy(scores: jnp.ndarray, g: Graph):
    """Fraction of nodes whose rank matches the label rank (reference
    ``saveall``'s ``(out_indices == y_indices).sum()``)."""
    mask = np.asarray(g.node_mask())
    s = np.asarray(scores)[mask]
    y = np.asarray(g.y).reshape(-1)[mask]
    return float(np.mean(np.argsort(s) == np.argsort(y)))


def predicted_ordering(scores: jnp.ndarray, num_valid: Optional[int] = None) -> np.ndarray:
    """Scores → permutation vector ``perm[rank] = node`` → inverse permutation
    written like the reference (``testsage.py:115-121``: position of each
    node in the predicted order)."""
    s = np.asarray(scores)
    if num_valid is not None:
        s = s[:num_valid]
    order_idx = np.argsort(s, kind="stable")
    inv = np.empty_like(order_idx)
    inv[order_idx] = np.arange(len(order_idx))
    return inv
