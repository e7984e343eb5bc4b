"""Cluster-GCN partition loader — reference ``torch_geometric/data/
cluster.py:10-155``.

The reference partitions with METIS through ``torch.ops.torch_sparse.
partition``.  Here partitioning is pluggable: the default is a host-side
BFS-grow greedy partitioner (good locality, zero native deps); a METIS-like
multilevel C++ partitioner can be slotted in via ``partition_fn`` (the one
place SURVEY.md §2.2 marks native code as genuinely warranted).
"""
from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np

from .batch import batch_graphs, pad_to_bucket
from .graph import Graph


def bfs_partition(
    senders: np.ndarray, receivers: np.ndarray, num_nodes: int, num_parts: int,
    *, seed: int = 0,
) -> np.ndarray:
    """Greedy BFS-grow partitioning: repeatedly grow a part from an unvisited
    seed until it reaches ``ceil(N/num_parts)`` nodes.  Returns ``[N]`` part
    ids.  Locality is close to METIS for mesh-like graphs (the matrix graphs
    this framework targets)."""
    target = -(-num_nodes // num_parts)
    s, r = np.asarray(senders), np.asarray(receivers)
    order = np.argsort(r, kind="stable")
    s_sorted = s[order]
    deg = np.bincount(r, minlength=num_nodes)
    start = np.concatenate([[0], np.cumsum(deg)])
    part = np.full(num_nodes, -1, np.int64)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(num_nodes)
    cur_part = 0
    count = 0
    from collections import deque

    queue: deque = deque()
    ptr = 0
    while True:
        if not queue:
            while ptr < num_nodes and part[perm[ptr]] != -1:
                ptr += 1
            if ptr == num_nodes:
                break
            queue.append(perm[ptr])
        v = queue.popleft()
        if part[v] != -1:
            continue
        part[v] = cur_part
        count += 1
        if count >= target and cur_part < num_parts - 1:
            cur_part += 1
            count = 0
            queue.clear()
            continue
        for u in s_sorted[start[v] : start[v + 1]]:
            if part[u] == -1:
                queue.append(u)
    return part


class ClusterData:
    """Partition one big graph into ``num_parts`` node clusters; index into
    it to get each cluster's induced subgraph (reference ``ClusterData``)."""

    def __init__(
        self,
        graph: Graph,
        num_parts: int,
        partition_fn: Optional[Callable] = None,
        seed: int = 0,
    ):
        self.graph = graph
        n = int(np.sum(graph.n_node))
        if partition_fn is None:
            # multilevel recursive bisection (METIS_PartGraph role) when the
            # native library is available; BFS-grow otherwise
            try:
                from .. import native

                partition_fn = lambda s, r, n_, p_, seed=0: native.ml_partition(
                    s, r, n_, p_
                )
            except Exception:
                partition_fn = bfs_partition
        self.part = partition_fn(
            np.asarray(graph.senders), np.asarray(graph.receivers), n, num_parts,
            seed=seed,
        )
        self.num_parts = num_parts
        self._clusters: List[np.ndarray] = [
            np.nonzero(self.part == p)[0] for p in range(num_parts)
        ]

    def __len__(self):
        return self.num_parts

    def __getitem__(self, idx: int) -> Graph:
        from ..utils.subgraph import induced_subgraph

        return induced_subgraph(self.graph, self._clusters[idx])

    def cluster_nodes(self, idx: int) -> np.ndarray:
        return self._clusters[idx]


class ClusterLoader:
    """Batch several clusters per step (union subgraph incl. inter-cluster
    edges, reference ``ClusterLoader.__collate__``), padded for jit."""

    def __init__(
        self,
        cluster_data: ClusterData,
        batch_size: int = 1,
        shuffle: bool = False,
        seed: int = 0,
        node_multiple: int = 128,
        edge_multiple: int = 512,
    ):
        self.cd = cluster_data
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.node_multiple = node_multiple
        self.edge_multiple = edge_multiple
        self._epoch = 0

    def __len__(self):
        return -(-self.cd.num_parts // self.batch_size)

    def __iter__(self):
        from ..utils.subgraph import induced_subgraph

        order = np.arange(self.cd.num_parts)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
            self._epoch += 1
        for i in range(len(self)):
            parts = order[i * self.batch_size : (i + 1) * self.batch_size]
            nodes = np.sort(
                np.concatenate([self.cd.cluster_nodes(p) for p in parts])
            )
            sub = induced_subgraph(self.cd.graph, nodes)
            yield pad_to_bucket(
                sub,
                node_multiple=self.node_multiple,
                edge_multiple=self.edge_multiple,
            ), nodes
