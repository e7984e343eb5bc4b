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
    """Minibatch iterator collating graph lists into disconnected-union batches (reference ``data/dataloader.py:DataLoader``)."""
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


class DataListLoader(DataLoader):
    """reference ``dataloader.py:DataListLoader`` — yields the raw list of
    graphs un-collated (the :class:`~..nn.data_parallel.DataParallel` input
    format, which shards the list itself)."""

    def collate(self, graphs: Sequence[Graph]):  # type: ignore[override]
        return list(graphs)


class DenseDataLoader(DataLoader):
    """reference ``dataloader.py:DenseDataLoader`` — stacks same-or-padded
    graphs into dense ``[B, N_max, ...]`` tensors (the input format of the
    ``nn/dense`` layers / DiffPool).  Returns a dict with ``x``, ``adj``,
    ``mask`` and optionally ``y``."""

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 *, max_nodes: Optional[int] = None, **kw):
        super().__init__(dataset, batch_size, shuffle, **kw)
        if max_nodes is None:
            max_nodes = max(
                int(np.sum(dataset[i].n_node)) for i in range(len(dataset))
            )
        self.max_nodes = max_nodes

    def collate(self, graphs: Sequence[Graph]):  # type: ignore[override]
        b, n = len(graphs), self.max_nodes
        f = np.asarray(graphs[0].nodes).shape[-1]
        x = np.zeros((b, n, f), np.float32)
        adj = np.zeros((b, n, n), np.float32)
        mask = np.zeros((b, n), bool)
        ys = []
        for i, g in enumerate(graphs):
            k = int(np.sum(g.n_node))
            if k > n:
                raise ValueError(f"graph has {k} nodes > max_nodes={n}")
            x[i, :k] = np.asarray(g.nodes)
            s, r = np.asarray(g.senders), np.asarray(g.receivers)
            w = (np.ones(len(s), np.float32) if g.edges is None
                 else np.asarray(g.edges, np.float32).reshape(len(s), -1)[:, 0])
            np.add.at(adj[i], (r, s), w)
            mask[i, :k] = True
            if g.y is not None:
                ys.append(np.asarray(g.y).reshape(-1))
        out = {"x": x, "adj": adj, "mask": mask}
        if ys:
            out["y"] = np.stack(ys)
        return out
