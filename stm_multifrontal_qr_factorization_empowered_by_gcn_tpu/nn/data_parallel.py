"""DataParallel — API-parity wrapper over the SPMD machinery.

Reference ``torch_geometric/nn/data_parallel.py:8-87``: scatter a list of
``Data`` over GPUs, replicate the module, gather.  On TPU the same UX is a
thin object over :mod:`..parallel`: give it a model and a list of graphs,
call it, get stacked per-shard outputs — underneath it pads each shard,
stacks them, and runs one ``shard_map`` forward over the ``data`` mesh axis.
For training use :func:`..parallel.make_spmd_train_step` directly.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..data.batch import batch_graphs, bucket_shape, pad_graph
from ..data.graph import Graph
from ..parallel.data_parallel import _graph_pytree_specs, stack_shards
from ..parallel.mesh import DATA_AXIS, make_mesh


class DataParallel:
    """``DataParallel(model, params)(list_of_graphs)`` → per-graph outputs.

    Splits the list into ``num_devices`` shards by cumulative node count
    (the reference's scatter heuristic, ``data_parallel.py:49-70``), pads
    each shard to a common bucket, and evaluates all shards in one SPMD
    forward."""

    def __init__(self, model, params, *, devices: Optional[Sequence] = None):
        self.model = model
        self.params = params
        self.devices = list(devices) if devices is not None else list(jax.devices())
        self.mesh = make_mesh(data=len(self.devices), graph=1, devices=self.devices)

    def _split(self, graphs: List[Graph]) -> List[List[Graph]]:
        d = len(self.devices)
        sizes = np.asarray([int(np.sum(g.n_node)) for g in graphs])
        csum = np.cumsum(sizes)
        bounds = np.linspace(0, csum[-1], d + 1)[1:-1]
        cut = np.searchsorted(csum, bounds).tolist() + [len(graphs)]
        shards, start = [], 0
        for c in cut:
            c = max(c, start + 1) if start < len(graphs) else start
            shards.append(graphs[start:c])
            start = c
        while len(shards) < d:
            shards.append([graphs[-1]])  # replicate-last for empty shards
        return shards

    def __call__(self, graphs: List[Graph], **kwargs):
        shards = self._split(list(graphs))
        # common bucket across shards → one stacked array
        b = [batch_graphs(s) for s in shards]
        n = max(int(np.sum(x.n_node)) for x in b)
        e = max(int(np.sum(x.n_edge)) for x in b)
        n_pad, e_pad = bucket_shape(n, e)
        g_pad = max(len(s) for s in shards) + 1
        padded = [
            pad_graph(x, num_nodes=n_pad, num_edges=e_pad, num_graphs=g_pad)
            for x in b
        ]
        stacked = stack_shards(padded)

        def fwd(params, g):
            g = jax.tree_util.tree_map(lambda a: a[0], g)
            return self.model.apply(params, g, **kwargs)

        specs = _graph_pytree_specs(stacked, P(DATA_AXIS), P(DATA_AXIS))
        fn = jax.jit(
            jax.shard_map(
                fwd, mesh=self.mesh, in_specs=(P(), specs),
                out_specs=P(DATA_AXIS), check_vma=True,
            )
        )
        out = fn(self.params, stacked)  # [D * G_pad, ...] gathered
        # return per-shard outputs trimmed to real graphs
        out = out.reshape(len(shards), g_pad, *out.shape[1:])
        return [out[i, : len(s)] for i, s in enumerate(shards)]
