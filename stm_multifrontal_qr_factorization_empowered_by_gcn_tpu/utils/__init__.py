"""Graph utilities: degree, softmax, self-loops, undirected, subgraph,
dense batching, negative sampling, random graphs, metrics
(``torch_geometric/utils/``).
"""
from .degree import degree
from .loop import (
    add_self_loops, add_remaining_self_loops, remove_self_loops,
    contains_self_loops, segregate_self_loops,
)
from .undirected import (
    coalesce, to_undirected, is_undirected, sort_by_receiver, sort_edge_index,
)
from .softmax import softmax
from .to_dense_batch import to_dense_batch, from_dense_batch
from .metric import (
    accuracy, precision, recall, f1_score, true_positive, true_negative,
    false_positive, false_negative, intersection_and_union, mean_iou,
)
from .subgraph import (
    induced_subgraph, k_hop_subgraph, subgraph,
    contains_isolated_nodes, remove_isolated_nodes,
)
from .random_graphs import (
    barabasi_albert_graph, dropout_adj, erdos_renyi_graph,
    negative_sampling, negative_sampling_on_device,
    structured_negative_sampling, batched_negative_sampling,
    stochastic_blockmodel_graph, to_dense_adj,
)
from .convert import (
    dense_to_sparse, to_scipy_sparse_matrix, from_scipy_sparse_matrix,
    to_networkx, from_networkx, to_trimesh, from_trimesh,
    grid, get_laplacian, normalized_cut, homophily_ratio, geodesic_distance,
)
from .split import EdgeSplit, train_test_split_edges
from .tree_decomposition import tree_decomposition

__all__ = [
    "degree", "add_self_loops", "add_remaining_self_loops", "remove_self_loops",
    "contains_self_loops", "segregate_self_loops",
    "coalesce", "to_undirected", "is_undirected",
    "sort_by_receiver", "sort_edge_index", "softmax",
    "to_dense_batch", "from_dense_batch",
    "accuracy", "precision", "recall", "f1_score", "true_positive",
    "true_negative", "false_positive", "false_negative",
    "intersection_and_union", "mean_iou",
    "induced_subgraph", "k_hop_subgraph", "subgraph",
    "contains_isolated_nodes", "remove_isolated_nodes",
    "barabasi_albert_graph", "dropout_adj", "erdos_renyi_graph",
    "negative_sampling", "negative_sampling_on_device",
    "structured_negative_sampling", "batched_negative_sampling",
    "stochastic_blockmodel_graph", "to_dense_adj",
    "dense_to_sparse", "to_scipy_sparse_matrix", "from_scipy_sparse_matrix",
    "to_networkx", "from_networkx", "to_trimesh", "from_trimesh",
    "grid", "get_laplacian", "normalized_cut", "homophily_ratio",
    "geodesic_distance", "EdgeSplit", "train_test_split_edges",
    "tree_decomposition",
]
