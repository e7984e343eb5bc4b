from .coarsen import graclus_pool, greedy_matching, pool_graph
from .sag_pool import SAGPooling
from .topk_pool import TopKOutput, TopKPooling, topk_pool

__all__ = [
    "SAGPooling", "TopKOutput", "TopKPooling", "topk_pool",
    "graclus_pool", "greedy_matching", "pool_graph",
]
