"""k-nearest-neighbor graph construction — on-device, static shapes.

The reference delegates kNN to the ``torch-cluster`` C++/CUDA extension
(``torch_geometric/nn/conv/gravnet_conv.py:14``, ``x_conv.py:13``,
``transforms/knn_graph.py``).  The TPU-native design computes the dense
pairwise-distance matrix and takes a top-k — an O(N^2) matmul that the MXU
eats for the graph sizes point-cloud layers see, with batch separation
enforced by masking (no dynamic shapes, no host round trip).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[Na, Nb] squared euclidean distances (|a|^2 - 2ab + |b|^2 via MXU)."""
    a2 = jnp.sum(a * a, axis=-1)[:, None]
    b2 = jnp.sum(b * b, axis=-1)[None, :]
    cross = a @ b.T
    return jnp.maximum(a2 - 2.0 * cross + b2, 0.0)


def knn(
    x_src: jnp.ndarray,
    x_dst: jnp.ndarray,
    k: int,
    batch_src: Optional[jnp.ndarray] = None,
    batch_dst: Optional[jnp.ndarray] = None,
    *,
    mask_src: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For each row of ``x_dst``, the ``k`` nearest rows of ``x_src``.

    Returns ``(indices [Ndst, k], sqdists [Ndst, k])``.  Cross-graph pairs
    (``batch`` mismatch) and invalid sources (``mask_src`` False) are pushed
    to +inf distance, so with enough same-graph neighbors they never appear.
    Role equivalent of torch-cluster's ``knn`` (``gravnet_conv.py:89``).
    """
    d = pairwise_sqdist(x_dst, x_src)
    if batch_src is not None and batch_dst is not None:
        same = batch_dst[:, None] == batch_src[None, :]
        d = jnp.where(same, d, jnp.inf)
    if mask_src is not None:
        d = jnp.where(mask_src[None, :], d, jnp.inf)
    neg_d, idx = jax.lax.top_k(-d, k)
    return idx, -neg_d


def knn_graph(
    pos: jnp.ndarray,
    k: int,
    batch: Optional[jnp.ndarray] = None,
    *,
    loop: bool = False,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """COO ``(senders, receivers)`` of each node's k nearest neighbors.

    ``senders[e]`` is the neighbor, ``receivers[e]`` the center node —
    matching the reference's ``knn_graph(..., flow='target_to_source')``
    convention used by ``XConv`` (``x_conv.py:126``).  With ``loop=False``
    the self-match is excluded by inflating the diagonal.
    """
    n = pos.shape[0]
    d = pairwise_sqdist(pos, pos)
    if batch is not None:
        same = batch[:, None] == batch[None, :]
        d = jnp.where(same, d, jnp.inf)
    if mask is not None:
        d = jnp.where(mask[None, :], d, jnp.inf)
    if not loop:
        d = d + jnp.diag(jnp.full((n,), jnp.inf, d.dtype))
    _, idx = jax.lax.top_k(-d, k)          # [N, k] neighbor ids
    receivers = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    senders = idx.reshape(-1).astype(jnp.int32)
    return senders, receivers
