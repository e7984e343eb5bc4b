"""Device-mesh helpers — the TPU-native scaling substrate.

The reference scales with NCCL ``DistributedDataParallel``
(``examples/multi_gpu/distributed_sampling.py:61-114``) and a single-process
``DataParallel`` scatter (``torch_geometric/nn/data_parallel.py:8-87``).  On
TPU neither API shape survives: parallelism is expressed as a
``jax.sharding.Mesh`` with named axes, sharding annotations, and XLA-inserted
collectives over ICI/DCN.  This module standardizes the two axes the framework
uses (SURVEY.md §2.3):

* ``"data"``  — batch/data parallelism (DDP/DataParallel equivalent).
* ``"graph"`` — partition parallelism over one giant graph's node/edge sets
  (the Cluster-GCN / multi-host edge-partitioning axis).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
GRAPH_AXIS = "graph"


def make_mesh(
    data: Optional[int] = None,
    graph: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, graph)`` mesh over the available devices.

    ``data=None`` uses all remaining devices after the ``graph`` axis.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if n % graph != 0:
        raise ValueError(f"{n} devices not divisible by graph={graph}")
    if data is None:
        data = n // graph
    if data * graph > n:
        raise ValueError(f"mesh {data}x{graph} larger than {n} devices")
    devs = np.asarray(devices[: data * graph]).reshape(data, graph)
    return Mesh(devs, (DATA_AXIS, GRAPH_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for arrays with a leading per-device-batch axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def mesh_factors(n_devices: int) -> Tuple[int, int]:
    """Default ``(data, graph)`` factorization of ``n_devices``: keep the
    graph axis at 2 when possible (exercises partition collectives) and give
    the rest to data parallelism."""
    if n_devices % 2 == 0 and n_devices >= 4:
        return n_devices // 2, 2
    return n_devices, 1
