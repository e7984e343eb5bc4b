from .mtx import read_mtx, to_csr, Triplets
from .features import (
    compute_features, features_from_mtx, node_feature_table, edge_table,
    extinfo_row, GraphFeatures,
)

__all__ = [
    "read_mtx", "to_csr", "Triplets",
    "compute_features", "features_from_mtx", "node_feature_table",
    "edge_table", "extinfo_row", "GraphFeatures",
]
