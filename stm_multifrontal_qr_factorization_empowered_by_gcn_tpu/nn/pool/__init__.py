from .asap import ASAPooling, ASAPOutput
from .coarsen import graclus_pool, greedy_matching, pool_graph
from .sag_pool import SAGPooling
from .topk_pool import TopKOutput, TopKPooling, topk_pool

__all__ = [
    "ASAPooling", "ASAPOutput",
    "SAGPooling", "TopKOutput", "TopKPooling", "topk_pool",
    "graclus_pool", "greedy_matching", "pool_graph",
]
