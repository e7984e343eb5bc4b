from . import inits
from .message_passing import MessagePassing, propagate
from .conv import GCNConv, GraphConv, SAGEConv
from .glob import global_add_pool, global_max_pool, global_mean_pool, global_min_pool
from .pool import TopKPooling, topk_pool

__all__ = [
    "inits", "MessagePassing", "propagate",
    "GCNConv", "GraphConv", "SAGEConv",
    "global_add_pool", "global_max_pool", "global_mean_pool", "global_min_pool",
    "TopKPooling", "topk_pool",
]
