from .mtx import read_mtx, to_csr, Triplets
from .features import (
    compute_features, features_from_mtx, node_feature_table, edge_table,
    extinfo_row, GraphFeatures,
)
from .readers import (
    parse_sdf, read_npz, read_obj, read_off, read_planetoid_data, read_ply,
    read_sdf,
    read_tu_data, read_txt_array,
)

__all__ = [
    "read_mtx", "to_csr", "Triplets",
    "compute_features", "features_from_mtx", "node_feature_table",
    "edge_table", "extinfo_row", "GraphFeatures",
    "parse_sdf", "read_npz", "read_obj", "read_off", "read_planetoid_data", "read_ply",
    "read_sdf", "read_tu_data", "read_txt_array",
]
