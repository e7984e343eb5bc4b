"""Hierarchical pooling: TopK/SAG/ASAP/Edge pooling, graclus, voxel grid,
fps/radius/knn/nearest (``torch_geometric/nn/pool/``).
"""
from .asap import ASAPooling, ASAPOutput
from .coarsen import (
    avg_pool, avg_pool_neighbor_x, avg_pool_x, graclus_pool, greedy_matching,
    max_pool, max_pool_neighbor_x, max_pool_x, pool_graph,
)
from .edge_pool import EdgePooling, EdgePoolOutput, EdgePoolUnpool
from .sag_pool import SAGPooling
from .topk_pool import TopKOutput, TopKPooling, topk_pool
from .voxel_grid import voxel_grid

# geometric selection/grouping ops (torch-cluster roles) live in utils.knn;
# re-exported here to mirror the reference's nn.pool surface
from ...utils.knn import fps, knn, knn_graph, nearest, radius, radius_graph

# the reference aliases graclus at nn.pool level
graclus = greedy_matching

__all__ = [
    "ASAPooling", "ASAPOutput",
    "EdgePooling", "EdgePoolOutput", "EdgePoolUnpool",
    "SAGPooling", "TopKOutput", "TopKPooling", "topk_pool",
    "avg_pool", "avg_pool_neighbor_x", "avg_pool_x",
    "max_pool", "max_pool_neighbor_x", "max_pool_x",
    "graclus", "graclus_pool", "greedy_matching", "pool_graph", "voxel_grid",
    "fps", "knn", "knn_graph", "nearest", "radius", "radius_graph",
]
