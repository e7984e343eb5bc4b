"""Dataset file-format readers — reference ``torch_geometric/io/``
(planetoid.py, tu.py, npz.py, off.py, txt_array.py; ~440 LoC).

Host-side NumPy; no downloads (this image has no egress — files must already
sit in ``raw_dir``, matching the reference's post-download layout).
"""
from __future__ import annotations

import os.path as osp
import pickle
import sys
from typing import Dict, List, Optional

import numpy as np

from ..data.graph import Graph


def read_txt_array(path: str, sep=None, dtype=np.float32) -> np.ndarray:
    """reference ``io/txt_array.py``"""
    return np.loadtxt(path, delimiter=sep, dtype=dtype, ndmin=2)


# ---------------------------------------------------------------------------
# Planetoid (Cora/Citeseer/Pubmed)
# ---------------------------------------------------------------------------

def read_planetoid_data(raw_dir: str, name: str) -> Graph:
    """reference ``io/planetoid.py:read_planetoid_data`` — the pickled
    ind.{name}.{x,tx,allx,y,ty,ally,graph,test.index} files."""
    name = name.lower()
    objs = {}
    for ext in ("x", "tx", "allx", "y", "ty", "ally", "graph"):
        with open(osp.join(raw_dir, f"ind.{name}.{ext}"), "rb") as f:
            if sys.version_info > (3, 0):
                objs[ext] = pickle.load(f, encoding="latin1")
            else:  # pragma: no cover
                objs[ext] = pickle.load(f)
    test_idx = np.loadtxt(
        osp.join(raw_dir, f"ind.{name}.test.index"), dtype=np.int64
    )

    def _dense(m):
        return np.asarray(m.todense()) if hasattr(m, "todense") else np.asarray(m)

    allx, tx = _dense(objs["allx"]), _dense(objs["tx"])
    ally, ty = np.asarray(objs["ally"]), np.asarray(objs["ty"])

    sorted_test = np.sort(test_idx)
    if name == "citeseer":
        # some test ids are missing; re-index into a contiguous block
        full = np.arange(sorted_test.min(), sorted_test.max() + 1)
        tx_ext = np.zeros((len(full), tx.shape[1]), tx.dtype)
        ty_ext = np.zeros((len(full), ty.shape[1]), ty.dtype)
        tx_ext[sorted_test - sorted_test.min()] = tx[np.argsort(test_idx)]
        ty_ext[sorted_test - sorted_test.min()] = ty[np.argsort(test_idx)]
        tx, ty = tx_ext, ty_ext
        sorted_test = full
    else:
        order = np.argsort(test_idx)
        tx, ty = tx[order], ty[order]

    x = np.concatenate([allx, tx]).astype(np.float32)
    y_onehot = np.concatenate([ally, ty])
    # relocate the shuffled test rows to their true indices
    x[sorted_test] = x[len(allx):]
    y_onehot[sorted_test] = y_onehot[len(ally):]
    y = y_onehot.argmax(axis=1).astype(np.int32)

    n = x.shape[0]
    train_mask = np.zeros(n, bool)
    train_mask[: len(objs["y"])] = True
    val_mask = np.zeros(n, bool)
    val_mask[len(objs["y"]): len(objs["y"]) + 500] = True
    test_mask = np.zeros(n, bool)
    test_mask[test_idx] = True

    senders, receivers = [], []
    for src, nbrs in objs["graph"].items():
        for d in nbrs:
            if src < n and d < n:
                senders.append(src)
                receivers.append(d)
    s = np.asarray(senders, np.int32)
    r = np.asarray(receivers, np.int32)
    # undirected + dedup
    key = s.astype(np.int64) * n + r
    key2 = r.astype(np.int64) * n + s
    allk = np.unique(np.concatenate([key, key2]))
    s = (allk // n).astype(np.int32)
    r = (allk % n).astype(np.int32)

    g = Graph(
        nodes=x,
        senders=s,
        receivers=r,
        n_node=np.asarray([n], np.int32),
        n_edge=np.asarray([len(s)], np.int32),
        y=y,
    )
    return g, {"train": train_mask, "val": val_mask, "test": test_mask}


# ---------------------------------------------------------------------------
# TU graph-kernel datasets
# ---------------------------------------------------------------------------

def read_tu_data(raw_dir: str, prefix: str) -> List[Graph]:
    """reference ``io/tu.py:read_tu_data`` — {prefix}_A.txt,
    {prefix}_graph_indicator.txt, {prefix}_graph_labels.txt, optional
    node labels/attributes."""
    a = np.loadtxt(osp.join(raw_dir, f"{prefix}_A.txt"), delimiter=",", dtype=np.int64)
    indicator = np.loadtxt(
        osp.join(raw_dir, f"{prefix}_graph_indicator.txt"), dtype=np.int64
    )
    glabels = np.loadtxt(
        osp.join(raw_dir, f"{prefix}_graph_labels.txt"), dtype=np.int64
    )
    # optional features
    def _opt(name):
        p = osp.join(raw_dir, f"{prefix}_{name}.txt")
        return np.loadtxt(p, delimiter=",", ndmin=2) if osp.exists(p) else None

    node_labels = _opt("node_labels")
    node_attrs = _opt("node_attributes")

    indicator -= indicator.min()
    num_graphs = int(indicator.max()) + 1
    a -= 1  # 1-based files
    glabels -= glabels.min()

    node_of_graph = [np.nonzero(indicator == g)[0] for g in range(num_graphs)]
    graphs = []
    for gi in range(num_graphs):
        nodes = node_of_graph[gi]
        lo, hi = nodes.min(), nodes.max()
        emask = (a[:, 0] >= lo) & (a[:, 0] <= hi)
        s = (a[emask, 0] - lo).astype(np.int32)
        r = (a[emask, 1] - lo).astype(np.int32)
        feats = []
        if node_attrs is not None:
            feats.append(node_attrs[nodes])
        if node_labels is not None:
            lab = node_labels[nodes].astype(np.int64).reshape(len(nodes), -1)
            onehot = np.eye(int(node_labels.max()) + 1, dtype=np.float32)[lab[:, 0]]
            feats.append(onehot)
        x = (
            np.concatenate(feats, axis=1).astype(np.float32)
            if feats else np.ones((len(nodes), 1), np.float32)
        )
        graphs.append(
            Graph(
                nodes=x,
                senders=s,
                receivers=r,
                n_node=np.asarray([len(nodes)], np.int32),
                n_edge=np.asarray([len(s)], np.int32),
                y=np.asarray([glabels[gi]], np.int32),
            )
        )
    return graphs


# ---------------------------------------------------------------------------
# npz (Amazon / Coauthor style)
# ---------------------------------------------------------------------------

def read_npz(path: str) -> Graph:
    """reference ``io/npz.py`` — adjacency + attribute CSR arrays."""
    with np.load(path, allow_pickle=True) as f:
        d = dict(f)
    import scipy.sparse as sp

    adj = sp.csr_matrix(
        (d["adj_data"], d["adj_indices"], d["adj_indptr"]), shape=d["adj_shape"]
    ).tocoo()
    if "attr_data" in d:
        x = np.asarray(
            sp.csr_matrix(
                (d["attr_data"], d["attr_indices"], d["attr_indptr"]),
                shape=d["attr_shape"],
            ).todense(),
            dtype=np.float32,
        )
    else:
        x = d["attr_matrix"].astype(np.float32)
    y = d["labels"].astype(np.int32)
    n = x.shape[0]
    return Graph(
        nodes=x,
        senders=adj.col.astype(np.int32),
        receivers=adj.row.astype(np.int32),
        n_node=np.asarray([n], np.int32),
        n_edge=np.asarray([adj.nnz], np.int32),
        y=y,
    )


# ---------------------------------------------------------------------------
# OFF meshes
# ---------------------------------------------------------------------------

def read_off(path: str) -> Graph:
    """reference ``io/off.py`` — vertices as nodes, triangle edges."""
    with open(path) as f:
        header = f.readline().strip()
        if header != "OFF":
            counts = header[3:].split()
        else:
            counts = f.readline().split()
        nv, nf = int(counts[0]), int(counts[1])
        pos = np.asarray(
            [list(map(float, f.readline().split())) for _ in range(nv)],
            np.float32,
        )
        faces = [list(map(int, f.readline().split()))[1:] for _ in range(nf)]
    s, r = [], []
    for face in faces:
        for i in range(len(face)):
            a, b = face[i], face[(i + 1) % len(face)]
            s += [a, b]
            r += [b, a]
    return Graph(
        nodes=pos,
        senders=np.asarray(s, np.int32),
        receivers=np.asarray(r, np.int32),
        n_node=np.asarray([nv], np.int32),
        n_edge=np.asarray([len(s)], np.int32),
    )
