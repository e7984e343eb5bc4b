from .degree import degree
from .loop import (
    add_self_loops, add_remaining_self_loops, remove_self_loops, contains_self_loops,
)
from .undirected import coalesce, to_undirected, is_undirected, sort_by_receiver
from .softmax import softmax
from .to_dense_batch import to_dense_batch, from_dense_batch
from .metric import accuracy, precision, recall, f1_score
from .subgraph import induced_subgraph, k_hop_subgraph
from .random_graphs import (
    barabasi_albert_graph, dropout_adj, erdos_renyi_graph,
    negative_sampling, negative_sampling_on_device,
    stochastic_blockmodel_graph, to_dense_adj,
)

__all__ = [
    "degree", "add_self_loops", "add_remaining_self_loops", "remove_self_loops",
    "contains_self_loops", "coalesce", "to_undirected", "is_undirected",
    "sort_by_receiver", "softmax", "to_dense_batch", "from_dense_batch",
    "accuracy", "precision", "recall", "f1_score",
    "induced_subgraph", "k_hop_subgraph",
    "barabasi_albert_graph", "dropout_adj", "erdos_renyi_graph",
    "negative_sampling", "negative_sampling_on_device",
    "stochastic_blockmodel_graph", "to_dense_adj",
]
