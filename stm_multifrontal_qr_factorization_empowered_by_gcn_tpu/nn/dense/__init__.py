"""Dense (padded-adjacency) layer variants + diff/mincut pooling
(``torch_geometric/nn/dense/``) — the natively TPU-shaped path.
"""
from .layers import (
    DenseGCNConv,
    DenseGINConv,
    DenseGraphConv,
    DenseSAGEConv,
    dense_diff_pool,
    dense_mincut_pool,
    to_dense_adjacency,
)

__all__ = [
    "DenseGCNConv",
    "DenseGINConv",
    "DenseGraphConv",
    "DenseSAGEConv",
    "dense_diff_pool",
    "dense_mincut_pool",
    "to_dense_adjacency",
]
