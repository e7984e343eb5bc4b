from . import inits
from .message_passing import MessagePassing, propagate
from .conv import (
    AGNNConv,
    APPNP,
    ARMAConv,
    ChebConv,
    ClusterGCNConv,
    EdgeConv,
    GATConv,
    GATv2Conv,
    GCN2Conv,
    GCNConv,
    GINConv,
    GINEConv,
    GatedGraphConv,
    GraphConv,
    LEConv,
    NNConv,
    PNAConv,
    ResGatedGraphConv,
    SAGEConv,
    SGConv,
    TAGConv,
    TransformerConv,
)
from .glob import global_add_pool, global_max_pool, global_mean_pool, global_min_pool
from .pool import TopKPooling, topk_pool

__all__ = [
    "inits", "MessagePassing", "propagate",
    "AGNNConv", "APPNP", "ARMAConv", "ChebConv", "ClusterGCNConv", "EdgeConv",
    "GATConv", "GATv2Conv", "GCN2Conv", "GCNConv", "GINConv", "GINEConv",
    "GatedGraphConv", "GraphConv", "LEConv", "NNConv", "PNAConv", "ResGatedGraphConv",
    "SAGEConv", "SGConv", "TAGConv", "TransformerConv",
    "global_add_pool", "global_max_pool", "global_mean_pool", "global_min_pool",
    "TopKPooling", "topk_pool",
]
