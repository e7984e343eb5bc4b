"""Benchmarking-GNNs suites — reference ``torch_geometric/datasets/
{gnn_benchmark_dataset,mnist_superpixels}.py``.

Both raw contracts are torch-saved archives.  ``MNISTSuperpixels`` raws
are plain tensor tuples; the non-CSL ``GNNBenchmarkDataset`` raws are
PyG-collated ``(Data, slices)`` tuples, whose unpickling normally needs
torch_geometric installed — :func:`_pyg_torch_load` registers a minimal
stand-in ``Data`` class so the archives load in this framework-free
image and are re-sliced with the pickled ``slices`` dict
(``gnn_benchmark_dataset.py:115-126``)."""
from __future__ import annotations

import os.path as osp
import pickle
import sys
import types

import numpy as np

from ..data.dataset import InMemoryDataset
from ..data.download import download_url
from ..data.graph import Graph


class _ShimData:
    """Attribute-bag stand-in for ``torch_geometric.data.Data`` during
    unpickling (PyG Data pickles via its ``__dict__``)."""

    def __init__(self, **kwargs):
        self.__dict__.update(kwargs)

    def __getattr__(self, key):  # missing optional fields -> None
        if key.startswith("__"):
            raise AttributeError(key)
        return None


def _pyg_torch_load(path):
    """torch.load a file that may contain pickled torch_geometric
    classes, substituting :class:`_ShimData` for any of them."""
    import torch

    added = []
    if "torch_geometric" not in sys.modules:
        for name in ("torch_geometric", "torch_geometric.data",
                     "torch_geometric.data.data"):
            mod = types.ModuleType(name)
            sys.modules[name] = mod
            added.append(name)
        sys.modules["torch_geometric.data"].Data = _ShimData
        sys.modules["torch_geometric.data.data"].Data = _ShimData
    try:
        return torch.load(path, map_location="cpu", weights_only=False)
    finally:
        for name in added:
            del sys.modules[name]


def _np(t):
    return None if t is None else np.asarray(t)


def _uncollate(data, slices):
    """Invert PyG's collate: slice the concatenated tensors back into
    per-graph :class:`Graph` objects."""
    x, ei = _np(data.x), _np(data.edge_index)
    ea, pos, y = _np(data.edge_attr), _np(data.pos), _np(data.y)
    xs = _np(slices.get("x", slices.get("pos")))
    es = _np(slices["edge_index"])
    ys = _np(slices["y"])
    n_graphs = len(es) - 1
    graphs = []
    for i in range(n_graphs):
        lo, hi = int(xs[i]), int(xs[i + 1])
        el, eh = int(es[i]), int(es[i + 1])
        nodes = []
        if x is not None:
            nodes.append(x[lo:hi].reshape(hi - lo, -1).astype(np.float32))
        if pos is not None:
            nodes.append(pos[lo:hi].astype(np.float32))
        yi = y[int(ys[i]):int(ys[i + 1])]
        graphs.append(Graph(
            nodes=np.concatenate(nodes, axis=1) if nodes
            else np.zeros((hi - lo, 1), np.float32),
            senders=ei[0, el:eh].astype(np.int32),
            receivers=ei[1, el:eh].astype(np.int32),
            n_node=np.asarray([hi - lo], np.int32),
            n_edge=np.asarray([eh - el], np.int32),
            edges=None if ea is None
            else np.asarray(ea[el:eh], np.float32),
            y=np.asarray(yi, np.int32) if yi.dtype.kind in "iu"
            else np.asarray(yi, np.float32),
        ))
    return graphs


class GNNBenchmarkDataset(InMemoryDataset):
    """reference ``gnn_benchmark_dataset.py`` — PATTERN / CLUSTER /
    MNIST / CIFAR10 / TSP / CSL.  Non-CSL raws are the published
    ``{name}_{split}.pt`` collated archives (node features ‖ pos in
    ``nodes``); CSL raws are a pickle of scipy coo adjacencies + a torch
    label tensor, self-loops removed like the reference."""

    names = ["PATTERN", "CLUSTER", "MNIST", "CIFAR10", "TSP", "CSL"]

    url = "https://pytorch-geometric.com/datasets/benchmarking-gnns"
    csl_url = "https://www.dropbox.com/s/rnbkp5ubgk82ocu/CSL.zip?dl=1"

    def __init__(self, root, name: str, split: str = "train",
                 transform=None, pre_transform=None, pre_filter=None):
        assert name in self.names
        self.name = name
        if name == "CSL":
            split = "train"  # CSL has no standard split (reference log)
        assert split in ("train", "val", "test")
        super().__init__(osp.join(root, name), transform, pre_transform,
                         pre_filter)
        idx = 0 if name == "CSL" else \
            ("train", "val", "test").index(split)
        self.load_split(self.processed_paths[idx])

    @property
    def raw_file_names(self):
        if self.name == "CSL":
            return ["graphs_Kary_Deterministic_Graphs.pkl",
                    "y_Kary_Deterministic_Graphs.pt"]
        return [f"{self.name}_{s}.pt" for s in ("train", "val", "test")]

    @property
    def processed_file_names(self):
        if self.name == "CSL":
            return ["data.npz"]
        return [f"{s}.npz" for s in ("train", "val", "test")]

    def download(self):
        if self.name == "CSL":
            download_url(self.csl_url, self.raw_dir)
        else:
            download_url(f"{self.url}/{self.name}.zip", self.raw_dir)

    def process(self):
        if self.name == "CSL":
            self.save_split(self._process_csl(), self.processed_paths[0])
            return
        for i in range(3):
            data, slices = _pyg_torch_load(self.raw_paths[i])
            self.save_split(_uncollate(data, slices),
                            self.processed_paths[i])

    def _process_csl(self):
        import torch

        with open(self.raw_paths[0], "rb") as f:
            adjs = pickle.load(f)
        ys = torch.load(self.raw_paths[1], map_location="cpu",
                        weights_only=False).tolist()
        graphs = []
        for adj, y in zip(adjs, ys):
            row = np.asarray(adj.row, np.int64)
            col = np.asarray(adj.col, np.int64)
            keep = row != col  # remove self-loops (reference)
            n = adj.shape[0]
            graphs.append(Graph(
                nodes=np.zeros((n, 1), np.float32),
                senders=row[keep].astype(np.int32),
                receivers=col[keep].astype(np.int32),
                n_node=np.asarray([n], np.int32),
                n_edge=np.asarray([int(keep.sum())], np.int32),
                y=np.asarray([y], np.int32),
            ))
        return graphs


class MNISTSuperpixels(InMemoryDataset):
    """reference ``mnist_superpixels.py`` — 70k graphs of 75 superpixels.
    Raw = torch-saved ``(x, edge_index, edge_slice, pos, y)`` tuples;
    ``nodes`` = (intensity ‖ pos) → (75, 3)."""

    url = ("https://graphics.cs.tu-dortmund.de/fileadmin/ls7-www/misc/"
           "cvpr/mnist_superpixels.tar.gz")

    def __init__(self, root, train: bool = True, transform=None,
                 pre_transform=None, pre_filter=None):
        super().__init__(root, transform, pre_transform, pre_filter)
        self.load_split(self.processed_paths[0 if train else 1])

    @property
    def raw_file_names(self):
        return ["training.pt", "test.pt"]

    @property
    def processed_file_names(self):
        return ["training.npz", "test.npz"]

    def download(self):
        download_url(self.url, self.raw_dir)

    def process(self):
        import torch

        for raw_path, out_path in zip(self.raw_paths,
                                      self.processed_paths):
            x, edge_index, edge_slice, pos, y = torch.load(
                raw_path, map_location="cpu", weights_only=False)
            x = np.asarray(x, np.float32)
            ei = np.asarray(edge_index, np.int64)
            es = np.asarray(edge_slice, np.int64)
            pos = np.asarray(pos, np.float32)
            y = np.asarray(y, np.int32)
            m, n = len(y), 75
            x, pos = x.reshape(m * n, 1), pos.reshape(m * n, 2)
            graphs = []
            for i in range(m):
                lo, hi = i * n, (i + 1) * n
                el, eh = int(es[i]), int(es[i + 1])
                graphs.append(Graph(
                    nodes=np.concatenate([x[lo:hi], pos[lo:hi]], axis=1),
                    senders=ei[0, el:eh].astype(np.int32),
                    receivers=ei[1, el:eh].astype(np.int32),
                    n_node=np.asarray([n], np.int32),
                    n_edge=np.asarray([eh - el], np.int32),
                    y=y[i:i + 1],
                ))
            self.save_split(graphs, out_path)
