"""Segment reductions — the TPU-native replacement for torch-scatter.

The reference GNN stack bottoms out in the native ``torch_scatter`` CUDA/C++
kernels (``scatter``, ``segment_csr``; used by ``MessagePassing.aggregate`` at
``nn/conv/message_passing.py:270-300``).  Here the same capability is exposed
as functional wrappers over ``jax.ops.segment_*`` (which XLA lowers to sorted/
unsorted scatter on TPU) with:

* static ``num_segments`` (required under jit),
* optional validity masks (padding-safe semantics: sum→0, max→identity),
* correct gradients for free through JAX autodiff,
* an ``indices_are_sorted`` fast path — our batching layout guarantees
  receiver-sorted edges after CSR conversion, which XLA exploits.

``ops.spmm`` provides the fused matmul-shaped fast path (the analog of the
reference's ``message_and_aggregate`` SpMM, ``message_passing.py:219-229``).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _masked(data: jnp.ndarray, mask: Optional[jnp.ndarray], fill) -> jnp.ndarray:
    if mask is None:
        return data
    m = mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))
    return jnp.where(m, data, fill)


def segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    *,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Masked ``sum`` of ``data`` rows grouped by ``segment_ids`` (the scatter-add of reference ``torch_scatter.scatter(..., reduce='add')``)."""
    data = _masked(data, mask, 0)
    return jax.ops.segment_sum(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )


def segment_max(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    *,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Max-reduction; empty/masked segments yield 0 (matching torch_scatter's
    zero-fill for empty rows rather than -inf)."""
    neg = _neg_identity(data.dtype)
    data = _masked(data, mask, neg)
    out = jax.ops.segment_max(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    return jnp.where(out == neg, jnp.zeros_like(out), out)


def segment_min(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    *,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Masked per-segment ``min``; empty segments yield 0 (matching the reference's scatter-min fill convention)."""
    pos = _pos_identity(data.dtype)
    data = _masked(data, mask, pos)
    out = jax.ops.segment_min(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    return jnp.where(out == pos, jnp.zeros_like(out), out)


def segment_mean(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    *,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Masked per-segment ``mean`` with safe denominators (reference ``torch_scatter.scatter(..., reduce='mean')``)."""
    total = segment_sum(
        data, segment_ids, num_segments, mask=mask, indices_are_sorted=indices_are_sorted
    )
    ones = jnp.ones(data.shape[0], dtype=data.dtype)
    if mask is not None:
        ones = jnp.where(mask, ones, 0)
    counts = jax.ops.segment_sum(
        ones, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    counts = jnp.maximum(counts, 1)
    return total / counts.reshape(counts.shape + (1,) * (data.ndim - 1))


def segment_softmax(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    *,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Numerically-stable softmax within segments.

    The TPU equivalent of the reference's sparse ``softmax``
    (``torch_geometric/utils/softmax.py:9-39``): subtract the per-segment max,
    exponentiate, normalize by the per-segment sum.  Masked entries get 0.
    """
    neg = _neg_identity(data.dtype)
    masked = _masked(data, mask, neg)
    seg_max = jax.ops.segment_max(
        masked, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    seg_max = jnp.where(seg_max == neg, 0, seg_max)
    shifted = data - seg_max[segment_ids]
    ex = jnp.exp(shifted)
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))
        ex = jnp.where(m, ex, 0)
    denom = jax.ops.segment_sum(
        ex, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    denom = jnp.maximum(denom, _tiny(data.dtype))
    return ex / denom[segment_ids]


def segment_count(
    segment_ids: jnp.ndarray,
    num_segments: int,
    *,
    mask: Optional[jnp.ndarray] = None,
    dtype=jnp.int32,
) -> jnp.ndarray:
    """Number of (unmasked) rows per segment."""
    ones = jnp.ones(segment_ids.shape[0], dtype=dtype)
    if mask is not None:
        ones = jnp.where(mask, ones, 0)
    return jax.ops.segment_sum(ones, segment_ids, num_segments)


_AGGRS = {
    "add": segment_sum,
    "sum": segment_sum,
    "mean": segment_mean,
    "max": segment_max,
    "min": segment_min,
}


def aggregate(
    aggr: str,
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    *,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Dispatch on aggregation name — mirrors ``MessagePassing.aggregate``'s
    ``aggr`` argument (``message_passing.py:270``)."""
    try:
        fn = _AGGRS[aggr]
    except KeyError:
        raise ValueError(f"unknown aggregation {aggr!r}; one of {sorted(_AGGRS)}")
    return fn(
        data, segment_ids, num_segments, mask=mask, indices_are_sorted=indices_are_sorted
    )


def sharded_aggregate(
    aggr: str,
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    axis_name: str,
    *,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Aggregate edge-space data whose rows are sharded over mesh axis
    ``axis_name`` (inside ``shard_map``) into replicated node-space output.

    This is the collective half of edge-partitioned graph parallelism (the
    TPU analog of the reference's Cluster-GCN partitions + NCCL all-reduce,
    SURVEY.md §2.3): each device reduces its local edge shard, then the
    partials combine over ICI with ``psum``/``pmax``/``pmin``.  ``mean`` sums
    numerator and denominator separately before dividing (a psum of local
    means would be weighted wrongly).
    """
    if aggr in ("add", "sum"):
        out = jax.ops.segment_sum(
            _masked(data, mask, 0), segment_ids, num_segments,
            indices_are_sorted=indices_are_sorted,
        )
        return jax.lax.psum(out, axis_name)
    if aggr == "mean":
        total = jax.lax.psum(
            jax.ops.segment_sum(
                _masked(data, mask, 0), segment_ids, num_segments,
                indices_are_sorted=indices_are_sorted,
            ),
            axis_name,
        )
        ones = jnp.ones(data.shape[0], dtype=data.dtype)
        if mask is not None:
            ones = jnp.where(mask, ones, 0)
        counts = jax.lax.psum(
            jax.ops.segment_sum(
                ones, segment_ids, num_segments,
                indices_are_sorted=indices_are_sorted,
            ),
            axis_name,
        )
        counts = jnp.maximum(counts, 1)
        return total / counts.reshape(counts.shape + (1,) * (data.ndim - 1))
    if aggr in ("max", "min"):
        ident = _neg_identity(data.dtype) if aggr == "max" else _pos_identity(data.dtype)
        reduce = jax.ops.segment_max if aggr == "max" else jax.ops.segment_min
        out = reduce(
            _masked(data, mask, ident), segment_ids, num_segments,
            indices_are_sorted=indices_are_sorted,
        )
        out = jax.lax.pmax(out, axis_name) if aggr == "max" else jax.lax.pmin(out, axis_name)
        return jnp.where(out == ident, jnp.zeros_like(out), out)
    raise ValueError(f"unknown aggregation {aggr!r}")


def sharded_segment_softmax(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    axis_name: str,
    *,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """:func:`segment_softmax` for edge-sharded data: per-segment max and sum
    are combined across shards so attention coefficients normalize over the
    *global* incoming-edge set of every node."""
    neg = _neg_identity(data.dtype)
    seg_max = jax.lax.pmax(
        jax.ops.segment_max(
            _masked(data, mask, neg), segment_ids, num_segments,
            indices_are_sorted=indices_are_sorted,
        ),
        axis_name,
    )
    seg_max = jnp.where(seg_max == neg, 0, seg_max)
    ex = jnp.exp(data - seg_max[segment_ids])
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))
        ex = jnp.where(m, ex, 0)
    denom = jax.lax.psum(
        jax.ops.segment_sum(
            ex, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
        ),
        axis_name,
    )
    denom = jnp.maximum(denom, _tiny(data.dtype))
    return ex / denom[segment_ids]


def _neg_identity(dtype):
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.array(-jnp.inf, dtype)
    return jnp.iinfo(dtype).min


def _pos_identity(dtype):
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.array(jnp.inf, dtype)
    return jnp.iinfo(dtype).max


def _tiny(dtype):
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.finfo(dtype).tiny
    return 1
