"""Classorder / ClassorderTest — the reordering-classifier datasets.

Reference: ``torch_geometric/datasets/classorder.py:33-156`` and
``classorder_test.py:33-117``.  Each graph is one sparse matrix's structure;
node features are ``[graph_id, row, out_deg, in_deg, elim_fill]`` with the
last three normalized per-graph by ``x/(max+1)`` (reference
``classorder.py:106``); globals are the 10 raw extinfo stats (fed unchanged
to the MLP head, reference ``graphclass.py:44-59``); ``y ∈ {0..3}`` is the
optimal fill-reducing ordering (AMD/COLAMD/METIS/NESDIS).

Deviations from the reference (documented, see SURVEY.md §3.6):

* the reference re-shuffles its train/val/test split with an *unseeded* RNG
  at process time; here the split is seeded (``split_seed``) and therefore
  reproducible;
* per-graph structure files are regenerated, not read: from real ``.mtx``
  matrices when present in ``matrices_dir`` (features verified bit-exact
  against the C generator's outputs), otherwise synthesized deterministically
  from the published per-graph statistics (``synth_structure.py``) — the raw
  node/edge files for the 408 training graphs are absent upstream as well.
"""
from __future__ import annotations

import glob
import os.path as osp
from typing import Dict, List, Optional

import numpy as np

from ..data.dataset import InMemoryDataset, load_graphs
from ..data.graph import Graph
from ..io.features import GraphFeatures, features_from_mtx, node_feature_table
from .synth_structure import synthesize_features

SPLITS = ("train", "val", "test")


def _graph_from_features(
    gid: int,
    gf: GraphFeatures,
    extinfo: np.ndarray,
    label: Optional[int],
) -> Graph:
    node_tab = node_feature_table(gf, gid)  # [n, 5]: gid,row,rdeg,cdeg,eli
    x = node_tab.astype(np.float32)
    # reference normalization: x[:,2:5] /= (per-graph col max + 1)
    x[:, 2:5] = x[:, 2:5] / (x[:, 2:5].max(axis=0) + 1.0)
    senders = gf.rows.astype(np.int32)
    receivers = gf.cols.astype(np.int32)
    return Graph(
        nodes=x,
        senders=senders,
        receivers=receivers,
        n_node=np.asarray([x.shape[0]], np.int32),
        n_edge=np.asarray([senders.shape[0]], np.int32),
        globals=extinfo.astype(np.float32)[None, :],
        y=None if label is None else np.asarray([label], np.int32),
    )


def _index_matrices(matrices_dir: Optional[str]) -> Dict[tuple, str]:
    """Map (n, nnz) → mtx path for real-structure lookup."""
    if not matrices_dir or not osp.isdir(matrices_dir):
        return {}
    out = {}
    for p in sorted(glob.glob(osp.join(matrices_dir, "*.mtx"))):
        try:
            gf = features_from_mtx(p)
            out[(int(gf.extinfo[0]), int(gf.extinfo[1]))] = p
        except Exception:
            continue
    return out


class Classorder(InMemoryDataset):
    """408-graph training corpus with seeded 2/3–1/6–1/6 split."""

    def __init__(
        self,
        root: str,
        train_type: int = 0,  # 0=train, 1=val, 2=test (reference arg name)
        transform=None,
        pre_transform=None,
        *,
        split_seed: int = 1036,
        matrices_dir: Optional[str] = None,
    ):
        self.split_seed = split_seed
        self.matrices_dir = matrices_dir
        super().__init__(root, transform, pre_transform)
        self.load_split(self.processed_paths[train_type])

    @property
    def raw_file_names(self):
        return ["QR_extinfo.txt", "graph_y.txt"]

    @property
    def processed_file_names(self):
        # v3: family-dispatched structure synthesis (synth_structure.py)
        # v2: globals carry optional per-method fills in columns 10:14
        return [f"{s}_seed{self.split_seed}_v3.npz" for s in SPLITS]

    def download(self):
        raise FileNotFoundError(
            f"raw files missing under {self.raw_dir}; copy the reference's "
            "QR_extinfo.txt and graph_y.txt there (no network access)."
        )

    def process(self):
        ext = np.loadtxt(self.raw_paths[0])
        ylab = np.loadtxt(self.raw_paths[1])
        labels = {int(r[0]): int(r[1]) for r in np.atleast_2d(ylab)}
        mtx_index = _index_matrices(self.matrices_dir)
        # optional per-method fills (tools/compute_fills.py) -> globals[10:14]
        fills_path = osp.join(self.raw_dir, "fills.txt")
        fills = {}
        if osp.exists(fills_path):
            for r in np.atleast_2d(np.loadtxt(fills_path)):
                fills[int(r[0])] = r[1:5]

        graphs: List[Graph] = []
        for row in ext:
            gid = int(row[0])
            stats = row[1:]
            key = (int(stats[0]), int(stats[1]))
            if key in mtx_index:
                gf = features_from_mtx(mtx_index[key])
            else:
                gf = synthesize_features(stats, seed=gid)
            stats = np.concatenate([stats, fills.get(gid, np.zeros(4))])
            graphs.append(_graph_from_features(gid, gf, stats, labels.get(gid)))

        # seeded split, same fractions as the reference (classorder.py:74-76)
        rng = np.random.default_rng(self.split_seed)
        order = rng.permutation(len(graphs))
        n = len(graphs)
        cut1, cut2 = int(n * 2 / 3), int(n * 5 / 6)
        split_idx = {
            "train": order[:cut1],
            "val": order[cut1:cut2],
            "test": order[cut2:],
        }
        for split, path in zip(SPLITS, self.processed_paths):
            self.save_split([graphs[i] for i in split_idx[split]], path)

    # convenience: the reference's getexinfo (graphclass.py:45-59) —
    # per-graph 10-dim global features, already attached as Graph.globals.
    def extinfo(self, idx: int) -> np.ndarray:
        return np.asarray(self.get(idx).globals)[0]


class ClassorderTest(InMemoryDataset):
    """The 8 held-out paper matrices (reference ``classorder_test.py``).

    Node features come from the *published real* ``classorder.content``; edges
    come from the real ``.mtx`` when present in ``matrices_dir`` (5 of 8 ship
    with the reference), else are synthesized to the published stats.  Use
    ``real_structure_only=True`` to restrict to fully-real graphs when
    reporting accuracy.
    """

    def __init__(
        self,
        root: str,
        train_type: int = 0,  # kept for API parity; single split
        transform=None,
        pre_transform=None,
        *,
        matrices_dir: Optional[str] = None,
        real_structure_only: bool = False,
    ):
        self.matrices_dir = matrices_dir
        super().__init__(root, transform, pre_transform)
        self.load_split(self.processed_paths[0])
        if real_structure_only:
            # globals layout here: [:, :10] published stats, [:, 10] real flag
            self._graphs = [
                g for g in self._graphs if float(np.asarray(g.globals)[0, 10]) > 0
            ]

    @property
    def raw_file_names(self):
        return ["QR_extinfo.txt", "graph_y.txt", "classorder.content"]

    @property
    def processed_file_names(self):
        return ["test.npz"]

    def download(self):
        raise FileNotFoundError(
            f"raw files missing under {self.raw_dir}; copy the reference's "
            "Classtest raw files there (no network access)."
        )

    def process(self):
        ext = np.loadtxt(self.raw_paths[0])
        ylab = np.loadtxt(self.raw_paths[1])
        content = np.loadtxt(self.raw_paths[2])
        labels = {int(r[0]): int(r[1]) for r in np.atleast_2d(ylab)}
        mtx_index = _index_matrices(self.matrices_dir)

        graphs: List[Graph] = []
        for row in np.atleast_2d(ext):
            gid = int(row[0])
            stats = row[1:]
            key = (int(stats[0]), int(stats[1]))
            real = key in mtx_index
            if real:
                gf = features_from_mtx(mtx_index[key])
                g = _graph_from_features(gid, gf, stats, labels.get(gid))
            else:
                gf = synthesize_features(stats, seed=gid)
                g = _graph_from_features(gid, gf, stats, labels.get(gid))
                # overwrite node features with the published real ones
                rows = content[content[:, 0] == gid]
                rows = rows[rows[:, 1].argsort()]
                x = rows.astype(np.float32)
                x[:, 2:5] = x[:, 2:5] / (x[:, 2:5].max(axis=0) + 1.0)
                if x.shape[0] == np.asarray(g.nodes).shape[0]:
                    g = g.replace(nodes=x)
            flag = np.asarray([[1.0 if real else 0.0]], np.float32)
            g = g.replace(
                globals=np.concatenate([np.asarray(g.globals), flag], axis=1)
            )
            graphs.append(g)
        self.save_split(graphs, self.processed_paths[0])
