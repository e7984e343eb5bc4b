"""Parallelism: device meshes, SPMD data parallelism, edge-partitioned
graph parallelism (SURVEY.md §2.3 — the reference's DataParallel/DDP/
Cluster-GCN axes re-expressed as one mesh + collectives design)."""
from . import context  # noqa: F401
from .context import edge_sharding  # noqa: F401
from .data_parallel import (  # noqa: F401
    make_spmd_eval_step,
    make_spmd_train_step,
    shard_batches,
    stack_shards,
)
from .mesh import DATA_AXIS, GRAPH_AXIS, make_mesh, mesh_factors  # noqa: F401
from .partition import (  # noqa: F401
    PartitionedGraph,
    extended_features,
    gather_global,
    halo_exchange,
    local_part,
    partition_graph,
    partitioned_spmm,
)
