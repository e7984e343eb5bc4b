"""DataLoader — reference ``torch_geometric/data/dataloader.py:8-113``.

Collates fixed-size batches of graphs into padded static-shape ``Graph``
batches (disconnected union + bucket padding), the jit-friendly equivalent of
the reference's ``Collater`` → ``Batch.from_data_list``.
"""
from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np

from .batch import batch_graphs, pad_graph, bucket_shape
from .graph import Graph


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        *,
        seed: int = 0,
        drop_last: bool = False,
        node_multiple: int = 128,
        edge_multiple: int = 512,
        pad_nodes: Optional[int] = None,
        pad_edges: Optional[int] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.node_multiple = node_multiple
        self.edge_multiple = edge_multiple
        self.pad_nodes = pad_nodes
        self.pad_edges = pad_edges
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Graph]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
            self._epoch += 1
        for start in range(0, n, self.batch_size):
            idx = order[start : start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                break
            yield self.collate([self.dataset[int(i)] for i in idx])

    def collate(self, graphs: Sequence[Graph]) -> Graph:
        b = batch_graphs(list(graphs))
        if self.pad_nodes is not None and self.pad_edges is not None:
            nn_, ee = self.pad_nodes, self.pad_edges
        else:
            nn_, ee = bucket_shape(
                int(np.sum(b.n_node)),
                int(np.sum(b.n_edge)),
                node_multiple=self.node_multiple,
                edge_multiple=self.edge_multiple,
            )
        # graph axis fixed at batch_size+1 so every batch of an epoch shares
        # one compiled shape (the +1 slot absorbs padding nodes/edges)
        return pad_graph(b, num_nodes=nn_, num_edges=ee, num_graphs=self.batch_size + 1)
