"""Classic small datasets — reference ``torch_geometric/datasets/
{karate,planetoid,tu_dataset,suite_sparse}.py``.

* :class:`KarateClub` ships its data inline (like the reference).
* :class:`Planetoid` / :class:`TUDataset` read the standard raw files from
  disk (no egress in this image; ``download()`` raises with instructions).
* :class:`SuiteSparseMatrixCollection` builds graphs from local ``.mtx``
  files (the reference downloads from sparse.tamu.edu).
"""
from __future__ import annotations

import glob
import os.path as osp
from typing import List, Optional

import numpy as np

from ..data.dataset import InMemoryDataset
from ..data.graph import Graph
from ..io.readers import read_planetoid_data, read_tu_data

# Zachary's karate club: 78 undirected edges (same data the reference embeds
# in datasets/karate.py), community labels from the original study.
_KARATE_EDGES = [
    (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8), (0, 10),
    (0, 11), (0, 12), (0, 13), (0, 17), (0, 19), (0, 21), (0, 31), (1, 2),
    (1, 3), (1, 7), (1, 13), (1, 17), (1, 19), (1, 21), (1, 30), (2, 3),
    (2, 7), (2, 8), (2, 9), (2, 13), (2, 27), (2, 28), (2, 32), (3, 7),
    (3, 12), (3, 13), (4, 6), (4, 10), (5, 6), (5, 10), (5, 16), (6, 16),
    (8, 30), (8, 32), (8, 33), (9, 33), (13, 33), (14, 32), (14, 33),
    (15, 32), (15, 33), (18, 32), (18, 33), (19, 33), (20, 32), (20, 33),
    (22, 32), (22, 33), (23, 25), (23, 27), (23, 29), (23, 32), (23, 33),
    (24, 25), (24, 27), (24, 31), (25, 31), (26, 29), (26, 33), (27, 33),
    (28, 31), (28, 33), (29, 32), (29, 33), (30, 32), (30, 33), (31, 32),
    (31, 33), (32, 33),
]
_KARATE_Y = [
    1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 1, 1, 1, 1, 0, 0, 1, 1, 0, 1, 0, 1, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
]


class KarateClub:
    """34-node social network, 4-community labels in the reference; here the
    classic 2-faction labels (reference karate.py embeds similar data)."""

    def __init__(self, transform=None):
        s = np.asarray([e[0] for e in _KARATE_EDGES] + [e[1] for e in _KARATE_EDGES], np.int32)
        r = np.asarray([e[1] for e in _KARATE_EDGES] + [e[0] for e in _KARATE_EDGES], np.int32)
        g = Graph(
            nodes=np.eye(34, dtype=np.float32),
            senders=s,
            receivers=r,
            n_node=np.asarray([34], np.int32),
            n_edge=np.asarray([len(s)], np.int32),
            y=np.asarray(_KARATE_Y, np.int32),
        )
        self._g = g if transform is None else transform(g)

    def __len__(self):
        return 1

    def __getitem__(self, idx):
        assert idx == 0
        return self._g

    get = __getitem__


class Planetoid(InMemoryDataset):
    """Cora / Citeseer / Pubmed full-batch node classification."""

    def __init__(self, root: str, name: str, transform=None, pre_transform=None):
        self.name = name.lower()
        super().__init__(root, transform, pre_transform)
        self.load_split(self.processed_paths[0])
        self.split_masks = dict(np.load(self.processed_paths[1], allow_pickle=True))

    @property
    def raw_file_names(self):
        exts = ["x", "tx", "allx", "y", "ty", "ally", "graph", "test.index"]
        return [f"ind.{self.name}.{e}" for e in exts]

    @property
    def processed_file_names(self):
        return ["data.npz", "masks.npz"]

    def download(self):
        raise FileNotFoundError(
            f"place the planetoid raw files for {self.name!r} under "
            f"{self.raw_dir} (no network egress in this environment)"
        )

    def process(self):
        g, masks = read_planetoid_data(self.raw_dir, self.name)
        self.save_split([g], self.processed_paths[0])
        np.savez(self.processed_paths[1], **masks)


class TUDataset(InMemoryDataset):
    """TU graph-classification collections (MUTAG, PROTEINS, ...)."""

    def __init__(self, root: str, name: str, transform=None, pre_transform=None):
        self.name = name
        super().__init__(root, transform, pre_transform)
        self.load_split(self.processed_paths[0])

    @property
    def raw_file_names(self):
        return [
            f"{self.name}_A.txt",
            f"{self.name}_graph_indicator.txt",
            f"{self.name}_graph_labels.txt",
        ]

    @property
    def processed_file_names(self):
        return ["data.npz"]

    def download(self):
        raise FileNotFoundError(
            f"place the TU raw files for {self.name!r} under {self.raw_dir}"
        )

    def process(self):
        graphs = read_tu_data(self.raw_dir, self.name)
        if self.pre_transform is not None:
            graphs = [self.pre_transform(g) for g in graphs]
        self.save_split(graphs, self.processed_paths[0])


class SuiteSparseMatrixCollection(InMemoryDataset):
    """reference ``datasets/suite_sparse.py:8-79`` — one graph per sparse
    matrix.  Uses local ``.mtx`` files under ``<root>/raw`` (or
    ``matrices_dir``) when present; otherwise downloads the MatrixMarket
    tarball from sparse.tamu.edu (``url``), exactly the reference's role —
    in a no-egress environment the download raises with a clear message and
    the local path remains the supported route."""

    url = "https://sparse.tamu.edu/MM/{}/{}.tar.gz"

    def __init__(
        self, root: str, group: str = "local", name: Optional[str] = None,
        transform=None, pre_transform=None, matrices_dir: Optional[str] = None,
    ):
        self.group = group
        self.mtx_name = name
        self.matrices_dir = matrices_dir
        super().__init__(root, transform, pre_transform)
        self.load_split(self.processed_paths[0])

    @property
    def raw_file_names(self):
        if self.mtx_name and self.group != "local":
            return [f"{self.mtx_name}.mtx"]
        return []

    @property
    def processed_file_names(self):
        return [f"{self.group}_{self.mtx_name or 'all'}.npz"]

    def download(self):
        """Fetch + extract ``{group}/{name}.tar.gz`` (reference
        ``suite_sparse.py:52-54``'s role for .mat, using the MM mirror)."""
        if self.group == "local" or not self.mtx_name:
            return  # local mode: nothing to fetch
        import io
        import os
        import tarfile
        import urllib.request

        url = self.url.format(self.group, self.mtx_name)
        try:
            with urllib.request.urlopen(url, timeout=60) as resp:
                blob = resp.read()
        except Exception as exc:  # no egress in this environment
            raise RuntimeError(
                f"could not download {url} ({exc}); place "
                f"{self.mtx_name}.mtx under {self.raw_dir} or pass "
                "matrices_dir= instead"
            ) from exc
        os.makedirs(self.raw_dir, exist_ok=True)
        with tarfile.open(fileobj=io.BytesIO(blob), mode="r:gz") as tar:
            for m in tar.getmembers():
                if m.name.endswith(f"{self.mtx_name}.mtx"):
                    with tar.extractfile(m) as f:
                        out = osp.join(self.raw_dir, f"{self.mtx_name}.mtx")
                        with open(out, "wb") as dst:
                            dst.write(f.read())

    def process(self):
        from ..io.mtx import read_mtx

        search = self.matrices_dir or self.raw_dir
        paths = sorted(glob.glob(osp.join(search, "*.mtx")))
        if self.mtx_name:
            paths = [p for p in paths if osp.basename(p) == f"{self.mtx_name}.mtx"]
        if not paths:
            raise FileNotFoundError(f"no .mtx files under {search}")
        graphs: List[Graph] = []
        for p in paths:
            t = read_mtx(p)
            n = max(t.nrow, t.ncol)
            graphs.append(
                Graph(
                    nodes=np.ones((n, 1), np.float32),
                    senders=t.rows.astype(np.int32),
                    receivers=t.cols.astype(np.int32),
                    n_node=np.asarray([n], np.int32),
                    n_edge=np.asarray([len(t.rows)], np.int32),
                    edges=t.vals.astype(np.float32),
                )
            )
        self.save_split(graphs, self.processed_paths[0])
