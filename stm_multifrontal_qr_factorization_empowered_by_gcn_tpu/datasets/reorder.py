"""Reorder — per-node elimination-order dataset (reference
``torch_geometric/datasets/reorder.py:33-132``).

Per graph: node feature = in+out degree (integer, consumed by an Embedding),
label ``y = (order+1)/(max_order+2)`` ∈ (0,1) — the node's normalized position
in a fill-reducing elimination order; edges symmetrized (reference ``row/col
append`` at ``reorder.py:71-75``).

Deviations (documented): the upstream repo ships neither ``reorder.cites``
nor ``reorder.content``, so graphs are regenerated from ``.mtx`` matrices in
``matrices_dir`` (plus deterministic synthetic graphs up to ``num_graphs``),
and order labels come from a reverse-Cuthill-McKee ordering (scipy) instead
of the unpublished generator; the reference's fixed split lists over 21 ids
are kept.
"""
from __future__ import annotations

import glob
import os.path as osp
from typing import List, Optional

import numpy as np

from ..data.dataset import InMemoryDataset
from ..data.graph import Graph
from ..io.mtx import read_mtx

# reference reorder.py:66-68 (note id 20 appears in splits but the loop runs
# range(20) — a reference quirk; we include all 21 graphs)
TRAIN_IDS = [5, 6, 10, 16, 17, 19]
VAL_IDS = [0, 9]
TEST_IDS = [1, 2, 3, 4, 7, 8, 11, 12, 13, 14, 15, 18, 20]
NUM_GRAPHS = 21
SPLITS = ("train", "val", "test")


def _rcm_order(n: int, senders: np.ndarray, receivers: np.ndarray) -> np.ndarray:
    """Reverse-Cuthill-McKee elimination order (label generator)."""
    try:
        import scipy.sparse as sp
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        a = sp.coo_matrix(
            (np.ones(len(senders)), (receivers, senders)), shape=(n, n)
        )
        perm = reverse_cuthill_mckee(a.tocsr(), symmetric_mode=True)
        order = np.empty(n, np.int64)
        order[perm] = np.arange(n)
        return order
    except ImportError:  # pragma: no cover
        return np.arange(n)


def _graph_from_structure(n: int, s: np.ndarray, r: np.ndarray) -> Graph:
    # symmetrize (reference reorder.py:71-75)
    s2 = np.concatenate([s, r]).astype(np.int32)
    r2 = np.concatenate([r, s]).astype(np.int32)
    deg = np.bincount(np.concatenate([s2]), minlength=n)
    x = np.minimum(deg, 99).astype(np.int32)[:, None]  # Embedding(100) input
    order = _rcm_order(n, s2, r2)
    y = (order + 1.0) / (order.max() + 2.0)
    return Graph(
        nodes=x,
        senders=s2,
        receivers=r2,
        n_node=np.asarray([n], np.int32),
        n_edge=np.asarray([len(s2)], np.int32),
        y=y.astype(np.float32),
    )


def _synth_structure(gid: int) -> Graph:
    rng = np.random.default_rng(1000 + gid)
    n = int(rng.integers(200, 1500))
    bw = int(rng.integers(3, 20))
    rows = np.repeat(np.arange(n), 3)
    cols = rows + rng.integers(-bw, bw + 1, size=len(rows))
    keep = (cols >= 0) & (cols < n) & (cols != rows)
    return _graph_from_structure(n, rows[keep].astype(np.int32), cols[keep].astype(np.int32))


class Reorder(InMemoryDataset):
    def __init__(
        self,
        root: str,
        train_type: int = 0,
        transform=None,
        pre_transform=None,
        *,
        matrices_dir: Optional[str] = None,
    ):
        self.matrices_dir = matrices_dir
        super().__init__(root, transform, pre_transform)
        self.load_split(self.processed_paths[train_type])

    @property
    def raw_file_names(self):
        return []

    @property
    def processed_file_names(self):
        return [f"{s}.npz" for s in SPLITS]

    def download(self):
        pass

    def process(self):
        mtx_paths: List[str] = []
        if self.matrices_dir and osp.isdir(self.matrices_dir):
            mtx_paths = sorted(glob.glob(osp.join(self.matrices_dir, "*.mtx")))
        names, graphs = [], []
        for gid in range(NUM_GRAPHS):
            if gid < len(mtx_paths):
                t = read_mtx(mtx_paths[gid])
                n = max(t.nrow, t.ncol)
                keep = t.rows != t.cols  # structure only, no self loops
                names.append(osp.splitext(osp.basename(mtx_paths[gid]))[0])
                graphs.append(
                    _graph_from_structure(
                        n,
                        t.rows[keep].astype(np.int32),
                        t.cols[keep].astype(np.int32),
                    )
                )
            else:
                names.append(f"synth_{gid}")
                graphs.append(_synth_structure(gid))
        self.names = names
        for split, ids in zip(SPLITS, (TRAIN_IDS, VAL_IDS, TEST_IDS)):
            path = self.processed_paths[SPLITS.index(split)]
            self.save_split([graphs[i] for i in ids], path)
        with open(osp.join(self.processed_dir, "names.txt"), "w") as f:
            f.write("\n".join(names))

    def graph_names(self, split: int) -> List[str]:
        ids = (TRAIN_IDS, VAL_IDS, TEST_IDS)[split]
        with open(osp.join(self.processed_dir, "names.txt")) as f:
            names = f.read().splitlines()
        return [names[i] for i in ids]
