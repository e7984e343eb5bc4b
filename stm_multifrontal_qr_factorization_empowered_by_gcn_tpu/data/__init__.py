"""Graph containers, batching, loaders, and samplers.

TPU-first re-design of reference ``torch_geometric/data/``: the ragged
``Data``/``Batch`` pair becomes a static-shape :class:`Graph` pytree with
padded disconnected-union batching, bucketed collation, and on-device
fanout/cluster/SAINT samplers.
"""
from .graph import Graph, from_edge_index, edge_index_of
from .batch import batch_graphs, pad_graph, pad_to_bucket, bucket_shape, unbatch
from .dataset import Dataset, InMemoryDataset, save_graphs, load_graphs
from .dataloader import DataListLoader, DataLoader, DenseDataLoader
from .download import (
    download_url, extract_bz2, extract_gz, extract_tar, extract_zip,
)
from .sampler import (
    BipartiteBlock, CSRTable, GraphSAINTEdgeSampler, GraphSAINTNodeSampler,
    GraphSAINTRandomWalkSampler, GraphSAINTSampler, NeighborSampler,
    RandomNodeSampler, build_csr_table, sample_block, sample_fanout,
)
from .cluster import ClusterData, ClusterLoader, bfs_partition
from .temporal import TemporalData

__all__ = [
    "Graph", "from_edge_index", "edge_index_of",
    "batch_graphs", "pad_graph", "pad_to_bucket", "bucket_shape", "unbatch",
    "Dataset", "InMemoryDataset", "save_graphs", "load_graphs",
    "DataLoader", "DataListLoader", "DenseDataLoader",
    "download_url", "extract_bz2", "extract_gz", "extract_tar", "extract_zip",
    "BipartiteBlock", "CSRTable", "GraphSAINTSampler",
    "GraphSAINTNodeSampler", "GraphSAINTEdgeSampler",
    "GraphSAINTRandomWalkSampler", "NeighborSampler",
    "RandomNodeSampler", "build_csr_table", "sample_block", "sample_fanout",
    "ClusterData", "ClusterLoader", "bfs_partition", "TemporalData",
]
