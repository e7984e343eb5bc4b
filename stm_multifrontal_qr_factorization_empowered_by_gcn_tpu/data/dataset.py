"""Dataset lifecycle — reference ``torch_geometric/data/dataset.py:27-231`` and
``in_memory_dataset.py:8-147``.

Same contract as the reference: a dataset owns ``root/raw`` and
``root/processed``; ``process()`` runs once and its output is cached (guarded
by marker files recording the pre-transform used, reference
``dataset.py:143-172``).  Storage is a single collated ``Graph`` (the
disconnected union produced by :func:`batch_graphs` — the exact analog of
``InMemoryDataset.collate``'s concat+slices) saved as ``.npz``.
"""
from __future__ import annotations

import os
import os.path as osp
from typing import Callable, List, Optional, Sequence

import numpy as np

from .batch import batch_graphs, unbatch
from .graph import Graph

Transform = Callable[[Graph], Graph]


def save_graphs(path: str, graphs: Sequence[Graph]) -> None:
    """Serialize a list of graphs as one collated npz archive."""
    if not graphs:  # a legitimately empty split (e.g. all-train corpora)
        np.savez_compressed(path, n_node=np.zeros(0, np.int32))
        return
    b = batch_graphs(list(graphs))
    arrays = {
        "nodes": np.asarray(b.nodes),
        "senders": np.asarray(b.senders),
        "receivers": np.asarray(b.receivers),
        "n_node": np.asarray(b.n_node),
        "n_edge": np.asarray(b.n_edge),
    }
    for opt in ("edges", "globals", "y"):
        v = getattr(b, opt)
        if v is not None:
            arrays[opt] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load_graphs(path: str) -> List[Graph]:
    """Load a list of :class:`Graph` pytrees from one ``.npz`` written by ``save_graphs``."""
    with np.load(path) as z:
        if "nodes" not in z:  # empty-split marker (see save_graphs)
            return []
        b = Graph(
            nodes=z["nodes"],
            senders=z["senders"],
            receivers=z["receivers"],
            n_node=z["n_node"],
            n_edge=z["n_edge"],
            edges=z["edges"] if "edges" in z else None,
            globals=z["globals"] if "globals" in z else None,
            y=z["y"] if "y" in z else None,
        )
    return unbatch(b)


class Dataset:
    """Download/process lifecycle base (reference ``data/dataset.py:27``)."""

    def __init__(
        self,
        root: str,
        transform: Optional[Transform] = None,
        pre_transform: Optional[Transform] = None,
        pre_filter: Optional[Callable[[Graph], bool]] = None,
    ):
        self.root = osp.expanduser(root)
        self.transform = transform
        self.pre_transform = pre_transform
        self.pre_filter = pre_filter
        self._download()
        self._process()

    # -- overridables -----------------------------------------------------
    @property
    def raw_file_names(self) -> Sequence[str]:
        raise NotImplementedError

    @property
    def processed_file_names(self) -> Sequence[str]:
        raise NotImplementedError

    def download(self):
        raise NotImplementedError

    def process(self):
        raise NotImplementedError

    def len(self) -> int:
        raise NotImplementedError

    def get(self, idx: int) -> Graph:
        raise NotImplementedError

    # -- dirs --------------------------------------------------------------
    @property
    def raw_dir(self) -> str:
        return osp.join(self.root, "raw")

    @property
    def processed_dir(self) -> str:
        return osp.join(self.root, "processed")

    @property
    def raw_paths(self) -> List[str]:
        return [osp.join(self.raw_dir, f) for f in self.raw_file_names]

    @property
    def processed_paths(self) -> List[str]:
        return [osp.join(self.processed_dir, f) for f in self.processed_file_names]

    # -- lifecycle ----------------------------------------------------------
    def _download(self):
        if all(osp.exists(p) for p in self.raw_paths):
            return
        os.makedirs(self.raw_dir, exist_ok=True)
        self.download()

    def _process(self):
        marker = osp.join(self.processed_dir, "pre_transform.txt")
        stamp = repr(self.pre_transform)
        if all(osp.exists(p) for p in self.processed_paths) and (
            not osp.exists(marker) or open(marker).read() == stamp
        ):
            return
        os.makedirs(self.processed_dir, exist_ok=True)
        self.process()
        with open(marker, "w") as f:
            f.write(stamp)

    # -- python protocol -----------------------------------------------------
    def __len__(self) -> int:
        return self.len()

    def __getitem__(self, idx):
        if isinstance(idx, (int, np.integer)):
            g = self.get(int(idx))
            return g if self.transform is None else self.transform(g)
        raise IndexError(f"unsupported index {idx!r}")

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

    def shuffle_indices(self, seed: int = 0) -> np.ndarray:
        rng = np.random.default_rng(seed)
        return rng.permutation(len(self))


class InMemoryDataset(Dataset):
    """Holds all graphs in RAM as a collated npz (reference
    ``in_memory_dataset.py:8-147``).  Subclasses' ``process()`` should call
    :meth:`save_split` per processed file."""

    def __init__(self, root, transform=None, pre_transform=None, pre_filter=None):
        self._graphs: Optional[List[Graph]] = None
        super().__init__(root, transform, pre_transform, pre_filter)

    def load_split(self, path: str):
        self._graphs = load_graphs(path)

    def save_split(self, graphs: Sequence[Graph], path: str):
        if self.pre_filter is not None:
            graphs = [g for g in graphs if self.pre_filter(g)]
        if self.pre_transform is not None:
            graphs = [self.pre_transform(g) for g in graphs]
        save_graphs(path, graphs)

    def len(self) -> int:
        return 0 if self._graphs is None else len(self._graphs)

    def get(self, idx: int) -> Graph:
        return self._graphs[idx]

    @property
    def num_features(self) -> int:
        g = self.get(0)
        return int(np.asarray(g.nodes).shape[-1])

    @property
    def num_classes(self) -> int:
        ys = [int(np.asarray(g.y).ravel()[0]) for g in self._graphs if g.y is not None]
        return int(max(ys)) + 1 if ys else 0
