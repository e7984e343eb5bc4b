"""Voxel-grid clustering — reference ``torch_geometric/nn/pool/voxel_grid.py``
(Dynamic Edge-Conditioned Filters, Simonovsky & Komodakis 2017).

The reference delegates to ``torch_cluster.grid_cluster`` (a CUDA/C++
kernel); here the voxel id is computed directly in JAX — a floor-divide and
a strided flatten, fully vectorized and jittable (no kernel needed: the op
is elementwise). The batch axis is appended as an extra grid dimension of
size 1 exactly like the reference, so clusters never span graphs.

Returns raw flattened voxel ids like ``grid_cluster`` (not consecutive);
pass ``consecutive=True`` for compacted ids suitable for
:func:`..pool.pool_graph` / segment aggregation (static-shape compaction via
sort, the reference's ``consecutive_cluster`` role).
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import jax.numpy as jnp

Scalar = Union[float, int]


def _per_dim(v, dim, dtype):
    if v is None:
        return None
    arr = jnp.asarray(v, dtype)
    if arr.ndim == 0:
        arr = jnp.full((dim,), arr, dtype)
    if arr.shape[0] != dim:
        raise ValueError(f"expected {dim} per-dim values, got {arr.shape}")
    return arr


def voxel_grid(
    pos: jnp.ndarray,
    graph_ids: jnp.ndarray,
    size: Union[Scalar, Sequence[Scalar], jnp.ndarray],
    *,
    start: Optional[Union[Scalar, Sequence[Scalar], jnp.ndarray]] = None,
    end: Optional[Union[Scalar, Sequence[Scalar], jnp.ndarray]] = None,
    node_mask: Optional[jnp.ndarray] = None,
    num_graphs: Optional[int] = None,
    consecutive: bool = False,
) -> jnp.ndarray:
    """[N] int32 voxel-cluster id per node.

    Args:
        pos: ``[N, D]`` (or ``[N]``) node positions.
        graph_ids: ``[N]`` graph assignment (the reference's ``batch``).
        size / start / end: scalar or per-dimension grid geometry; ``start``
            / ``end`` default to the masked global min / max per dimension.
        node_mask: ``[N]`` validity; padding nodes get the last voxel id.
        consecutive: compact ids to ``0..K-1`` (graph-major order preserved
            because the batch axis is the slowest-varying grid dimension).
    """
    pos = pos[:, None] if pos.ndim == 1 else pos
    n, dim = pos.shape
    dtype = pos.dtype
    sizes = _per_dim(size, dim, dtype)
    starts = _per_dim(start, dim, dtype)
    ends = _per_dim(end, dim, dtype)
    if node_mask is None:
        node_mask = jnp.ones(n, bool)

    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    pmask = jnp.where(node_mask[:, None], pos, big)
    if starts is None:
        starts = jnp.min(pmask, axis=0)
    pmask_hi = jnp.where(node_mask[:, None], pos, -big)
    if ends is None:
        ends = jnp.max(pmask_hi, axis=0)

    coords = jnp.floor((pos - starts) / sizes).astype(jnp.int32)
    dims = (jnp.floor((ends - starts) / sizes) + 1).astype(jnp.int32)
    coords = jnp.clip(coords, 0, dims - 1)

    # append the batch axis as the slowest grid dimension (reference :45-48)
    if num_graphs is None:
        num_graphs = int(jnp.max(graph_ids)) + 1
    strides = jnp.concatenate(
        [jnp.cumprod(dims[::-1])[::-1][1:], jnp.ones((1,), jnp.int32)]
    )
    flat = jnp.sum(coords * strides, axis=1)
    per_graph = jnp.prod(dims)
    cluster = graph_ids.astype(jnp.int32) * per_graph + flat
    cluster = jnp.where(node_mask, cluster, num_graphs * per_graph)

    if not consecutive:
        return cluster
    # static-shape compaction: rank of each distinct id in sorted order
    order = jnp.argsort(cluster)
    sorted_c = cluster[order]
    new = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), (sorted_c[1:] != sorted_c[:-1]).astype(jnp.int32)]
    )
    ranks = jnp.cumsum(new)
    out = jnp.zeros(n, jnp.int32).at[order].set(ranks)
    return out
