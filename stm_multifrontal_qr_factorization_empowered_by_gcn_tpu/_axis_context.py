"""Edge-sharding axis context.

The reference distributes a big graph by slicing its *edge set* across
workers (Cluster-GCN partitions, ``data/cluster.py:10-155``; DDP shards,
``examples/multi_gpu/distributed_sampling.py:68``) with explicit NCCL calls.
The TPU-native formulation: shard the edge arrays of a :class:`~..data.graph.
Graph` over a named mesh axis inside ``jax.shard_map`` and let every segment
reduction finish with a ``psum``/``pmax`` over that axis.

Rather than threading an ``axis_name`` argument through every layer, ops in
``ops.segment`` and the mask/ids helpers in ``data.graph`` consult this
context.  Enter it around the model application inside ``shard_map``::

    def per_shard(params, g):
        with edge_sharding("graph"):
            return model.apply(params, g)

Everything else — message functions, convs, pooling — is unchanged; this is
the graph analog of how sequence parallelism wraps attention with collectives
while the module code stays single-device.
"""
from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Optional

import jax

_state = threading.local()


def edge_axis() -> Optional[str]:
    """Mesh axis name the edge arrays are currently sharded over (or None)."""
    return getattr(_state, "axis", None)


@contextmanager
def edge_sharding(axis_name: str):
    """Declare that, within this scope, ``Graph.senders/receivers/edges`` hold
    only this device's shard of the (padded) edge set, sharded contiguously
    over mesh axis ``axis_name``; node arrays are replicated."""
    prev = getattr(_state, "axis", None)
    _state.axis = axis_name
    try:
        yield
    finally:
        _state.axis = prev


def edge_shard_offset(local_size: int):
    """Global index of this shard's first edge (0 when unsharded)."""
    axis = edge_axis()
    if axis is None:
        return 0
    return jax.lax.axis_index(axis) * local_size


def cross_shard_sum(x):
    axis = edge_axis()
    return x if axis is None else jax.lax.psum(x, axis)


def cross_shard_max(x):
    axis = edge_axis()
    return x if axis is None else jax.lax.pmax(x, axis)


def cross_shard_min(x):
    axis = edge_axis()
    return x if axis is None else jax.lax.pmin(x, axis)
