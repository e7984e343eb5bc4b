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
    """reference ``io/npz.py`` — adjacency + attribute CSR arrays, with the
    reference's normalizations (npz.py:16-22): binarized features
    (``x[x>0]=1``), self-loops removed, adjacency symmetrized + coalesced
    (``to_undirected``)."""
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
    x = (x > 0).astype(np.float32)
    y = d["labels"].astype(np.int32)
    n = x.shape[0]
    row, col = adj.row, adj.col
    keep = row != col
    row, col = row[keep], col[keep]
    # symmetrize + coalesce (reference to_undirected's internal coalesce)
    s = np.concatenate([row, col])
    r = np.concatenate([col, row])
    uniq = np.unique(s.astype(np.int64) * n + r.astype(np.int64))
    s = (uniq // n).astype(np.int32)
    r = (uniq % n).astype(np.int32)
    return Graph(
        nodes=x,
        senders=s,
        receivers=r,
        n_node=np.asarray([n], np.int32),
        n_edge=np.asarray([len(s)], np.int32),
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


def _mesh_graph(pos: np.ndarray, faces) -> Graph:
    """Vertices as nodes, per-face ring edges both ways (read_off's
    convention — the reference keeps a ``face`` tensor instead)."""
    s, r = [], []
    for face in faces:
        for i in range(len(face)):
            a, b = face[i], face[(i + 1) % len(face)]
            s += [a, b]
            r += [b, a]
    return Graph(
        nodes=np.asarray(pos, np.float32),
        senders=np.asarray(s, np.int32),
        receivers=np.asarray(r, np.int32),
        n_node=np.asarray([len(pos)], np.int32),
        n_edge=np.asarray([len(s)], np.int32),
    )


# ---------------------------------------------------------------------------
# OBJ meshes
# ---------------------------------------------------------------------------

def read_obj(path: str) -> Graph:
    """reference ``io/obj.py`` — ``v``/``f`` records (1-based face ids)."""
    vertices, faces = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                vertices.append([float(t) for t in line.split()[1:4]])
            elif line.startswith("f "):
                faces.append([int(t.split("/")[0]) - 1 for t in line.split()[1:]])
    if not vertices or not faces:
        raise ValueError(f"{path}: no vertices/faces")
    return _mesh_graph(np.asarray(vertices, np.float32), faces)


# ---------------------------------------------------------------------------
# ASCII PLY meshes
# ---------------------------------------------------------------------------

def read_ply(path: str) -> Graph:
    """reference ``io/ply.py`` (which shells out to openmesh) — here a
    self-contained ASCII-PLY parser: ``element vertex`` x/y/z properties and
    ``element face`` vertex-index lists."""
    with open(path) as f:
        if f.readline().strip() != "ply":
            raise ValueError(f"{path}: not a PLY file")
        nv = nf = 0
        order = []  # elements in declaration order
        line = f.readline()
        while line and line.strip() != "end_header":
            t = line.split()
            if t[:1] == ["format"] and t[1] != "ascii":
                raise ValueError(f"{path}: only ascii PLY supported")
            if t[:2] == ["element", "vertex"]:
                nv = int(t[2]); order.append("v")
            elif t[:2] == ["element", "face"]:
                nf = int(t[2]); order.append("f")
            line = f.readline()
        pos, faces = [], []
        for kind in order:
            if kind == "v":
                for _ in range(nv):
                    pos.append([float(x) for x in f.readline().split()[:3]])
            else:
                for _ in range(nf):
                    t = f.readline().split()
                    faces.append([int(x) for x in t[1 : 1 + int(t[0])]])
    return _mesh_graph(np.asarray(pos, np.float32), faces)


# ---------------------------------------------------------------------------
# SDF molecules
# ---------------------------------------------------------------------------

_SDF_ELEMS = {"H": 0, "C": 1, "N": 2, "O": 3, "F": 4}


def read_sdf(path: str) -> Graph:
    """reference ``io/sdf.py`` — one-hot atom types (H/C/N/O/F), symmetrized
    coalesced bonds with 0-based bond-type edge attrs, positions stacked
    after the one-hot block (the reference keeps them in ``pos``)."""
    with open(path) as f:
        return parse_sdf(f.read())


def parse_sdf(text: str) -> Graph:
    """Parse ONE molfile record (reference ``sdf.py:parse_sdf``); multi-
    record .sdf files split on ``$$$$`` (see ``datasets.QM9``)."""
    from ..utils.undirected import coalesce as _coalesce

    src = text.split("\n")[3:]
    num_atoms, num_bonds = (int(t) for t in src[0].split()[:2])
    atom_block = src[1 : num_atoms + 1]
    pos = np.asarray(
        [[float(t) for t in ln.split()[:3]] for ln in atom_block], np.float32
    )
    types = np.asarray([_SDF_ELEMS[ln.split()[3]] for ln in atom_block])
    x = np.eye(len(_SDF_ELEMS), dtype=np.float32)[types]
    bond_block = src[1 + num_atoms : 1 + num_atoms + num_bonds]
    row = np.asarray([int(ln.split()[0]) - 1 for ln in bond_block])
    col = np.asarray([int(ln.split()[1]) - 1 for ln in bond_block])
    attr = np.asarray([float(ln.split()[2]) - 1 for ln in bond_block], np.float32)
    ei = np.stack([np.concatenate([row, col]), np.concatenate([col, row])])
    ea = np.concatenate([attr, attr])[:, None]
    ei, ea = _coalesce(ei, ea, num_nodes=num_atoms, reduce="max")
    return Graph(
        nodes=np.concatenate([x, pos], axis=1),
        senders=ei[0].astype(np.int32),
        receivers=ei[1].astype(np.int32),
        edges=ea,
        n_node=np.asarray([num_atoms], np.int32),
        n_edge=np.asarray([ei.shape[1]], np.int32),
    )
