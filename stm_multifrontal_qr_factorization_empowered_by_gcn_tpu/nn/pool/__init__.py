from .asap import ASAPooling, ASAPOutput
from .coarsen import graclus_pool, greedy_matching, pool_graph
from .edge_pool import EdgePooling, EdgePoolOutput, EdgePoolUnpool
from .sag_pool import SAGPooling
from .topk_pool import TopKOutput, TopKPooling, topk_pool
from .voxel_grid import voxel_grid

__all__ = [
    "ASAPooling", "ASAPOutput",
    "EdgePooling", "EdgePoolOutput", "EdgePoolUnpool",
    "SAGPooling", "TopKOutput", "TopKPooling", "topk_pool",
    "graclus_pool", "greedy_matching", "pool_graph", "voxel_grid",
]
