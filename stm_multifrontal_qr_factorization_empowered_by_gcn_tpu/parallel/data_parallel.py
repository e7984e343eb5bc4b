"""Data parallelism — the DDP / ``DataParallel`` equivalent, TPU-native.

The reference offers two data-parallel paths (SURVEY.md §2.3):

* ``torch_geometric/nn/data_parallel.py:8-87`` — single-process scatter of a
  ``Data`` list over GPUs, module replication, gather;
* ``examples/multi_gpu/distributed_sampling.py:61-114`` — one process per GPU,
  NCCL ``DistributedDataParallel`` with gradient all-reduce.

Here both collapse into one SPMD formulation: the loader emits one padded
:class:`Graph` per device shard, :func:`stack_shards` stacks them on a leading
device axis, and :func:`make_spmd_train_step` builds a ``shard_map``-over-mesh
train step where parameters are replicated, the batch is split over the
``"data"`` axis, gradients are ``psum``-averaged over ICI by XLA, and — when
the mesh has a non-trivial ``"graph"`` axis — each replica's edge set is
additionally sharded over that axis with collective aggregation
(:mod:`.context`).  No NCCL-style API surface exists or is needed.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.graph import Graph
from . import context as _pctx
from .mesh import DATA_AXIS, GRAPH_AXIS


def stack_shards(graphs: Sequence[Graph]) -> Graph:
    """Stack equally-padded ``Graph``s on a new leading device axis.

    The inverse of the reference ``DataParallel.scatter``'s list-splitting
    (``nn/data_parallel.py:49-87``): instead of scattering a ragged list, the
    collator already produced one identically-shaped padded batch per shard.
    """
    if not graphs:
        raise ValueError("need at least one shard")

    def _stack(*leaves):
        return np.stack([np.asarray(l) for l in leaves], axis=0)

    return jax.tree_util.tree_map(_stack, *graphs)


def shard_batches(loader, num_shards: int):
    """Group a loader's padded batches into stacked ``num_shards``-wide
    super-batches (dropping a trailing incomplete group)."""
    group = []
    for g in loader:
        group.append(g)
        if len(group) == num_shards:
            yield stack_shards(group)
            group = []


def make_spmd_train_step(
    model,
    tx,
    mesh: Mesh,
    loss_fn: Callable[[jnp.ndarray, Graph], jnp.ndarray],
    *,
    has_dropout: bool = True,
) -> Callable:
    """Build ``step(params, opt_state, stacked_g, step_key) -> (params,
    opt_state, loss)`` jitted over ``mesh``.

    ``stacked_g`` has a leading ``data``-axis dimension; its edge arrays are
    further sharded over the ``graph`` axis when that axis has size > 1.
    Parameters and optimizer state are replicated; XLA inserts the gradient
    ``psum`` over ICI.
    """
    graph_size = mesh.shape[GRAPH_AXIS]
    data_spec, edge_spec = _graph_specs(graph_size)
    repl = P()

    def _loss(params, g: Graph, key):
        rngs = {"dropout": key} if has_dropout else None
        logp = model.apply(params, g, train=True, rngs=rngs)
        return loss_fn(logp, g)

    def _step(params, opt_state, g: Graph, key):
        # inside shard_map: leading data axis is local (size 1) — unstack
        g = jax.tree_util.tree_map(lambda a: a[0], g)
        if has_dropout:
            key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        ctx = (
            _pctx.edge_sharding(GRAPH_AXIS)
            if graph_size > 1
            else _nullcontext()
        )
        with ctx:
            loss, grads = jax.value_and_grad(_loss)(params, g, key)
        # DDP-equivalent gradient mean over the data axis; grads are already
        # identical across the graph axis (edge collectives ran inside).
        grads = jax.lax.pmean(grads, DATA_AXIS)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def _specs_for(g: Graph) -> Graph:
        return _graph_pytree_specs(g, data_spec, edge_spec)

    def step(params, opt_state, stacked_g: Graph, key):
        in_specs = (repl, repl, _specs_for(stacked_g), repl)
        out_specs = (repl, repl, repl)
        fn = jax.shard_map(
            _step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=True,
        )
        return fn(params, opt_state, stacked_g, key)

    return jax.jit(step)


def make_spmd_eval_step(model, mesh: Mesh, metric_fn) -> Callable:
    """``eval(params, stacked_g) -> summed metric tuple`` over the mesh."""
    graph_size = mesh.shape[GRAPH_AXIS]
    data_spec, edge_spec = _graph_specs(graph_size)
    repl = P()

    def _eval(params, g: Graph):
        g = jax.tree_util.tree_map(lambda a: a[0], g)
        ctx = (
            _pctx.edge_sharding(GRAPH_AXIS)
            if graph_size > 1
            else _nullcontext()
        )
        with ctx:
            logp = model.apply(params, g, train=False)
        out = metric_fn(logp, g)
        # values are identical across the graph axis (edge collectives ran
        # inside apply), so summing over the data axis alone is the total
        return jax.tree_util.tree_map(lambda m: jax.lax.psum(m, DATA_AXIS), out)

    def step(params, stacked_g: Graph):
        in_specs = (repl, _graph_pytree_specs(stacked_g, data_spec, edge_spec))
        fn = jax.shard_map(
            _eval, mesh=mesh, in_specs=in_specs, out_specs=repl,
            check_vma=True,
        )
        return fn(params, stacked_g)

    return jax.jit(step)


# ---------------------------------------------------------------------------

_EDGE_FIELDS = ("senders", "receivers", "edges")


def _graph_specs(graph_size: int):
    """(data-only spec, data+graph spec) for stacked Graph leaves."""
    data_spec = P(DATA_AXIS)
    edge_spec = P(DATA_AXIS, GRAPH_AXIS) if graph_size > 1 else P(DATA_AXIS)
    return data_spec, edge_spec


def _graph_pytree_specs(g: Graph, data_spec, edge_spec) -> Graph:
    """Per-field PartitionSpecs: edge-space arrays shard over (data, graph);
    everything else over data only (replicated within a graph group)."""
    fields = {}
    for name in Graph._fields:
        val = getattr(g, name)
        if val is None:
            fields[name] = None
            continue
        spec = edge_spec if name in _EDGE_FIELDS else data_spec
        fields[name] = jax.tree_util.tree_map(lambda _: spec, val)
    return Graph(**fields)


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False
