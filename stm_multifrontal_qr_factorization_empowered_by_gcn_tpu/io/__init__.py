"""Readers (mtx/planetoid/tu/npz/off/obj/ply/sdf/smiles) and the GCN
feature generator bit-matched to the reference C code
(``SparseCore_read_write.c:1040-1190``).
"""
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
