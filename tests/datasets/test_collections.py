"""Public dataset classes over synthesized raw files — reference
``datasets/{amazon,coauthor,citation_full,reddit,modelnet,faust,ppi}.py``
(the reference's own dataset tests only run on tiny downloads; here the raw
formats are synthesized so everything runs offline)."""
import json
import os.path as osp

import numpy as np
import pytest

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets import (
    FAUST,
    PPI,
    Amazon,
    CitationFull,
    ModelNet,
    Reddit,
)


def _write_npz_graph(path, n=10, f=4, classes=3, seed=0):
    """graph2gauss / gnn-benchmark npz schema (CSR adj + CSR attrs)."""
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    adj = sp.random(n, n, density=0.3, random_state=1, format="csr")
    attr = sp.random(n, f, density=0.5, random_state=2, format="csr")
    np.savez(
        path,
        adj_data=adj.data, adj_indices=adj.indices, adj_indptr=adj.indptr,
        adj_shape=np.asarray(adj.shape),
        attr_data=attr.data, attr_indices=attr.indices,
        attr_indptr=attr.indptr, attr_shape=np.asarray(attr.shape),
        labels=rng.integers(0, classes, n),
    )


def test_amazon_local_raw(tmp_path):
    root = tmp_path / "amz"
    raw = root / "computers" / "raw"
    raw.mkdir(parents=True)
    _write_npz_graph(raw / "amazon_electronics_computers.npz")
    ds = Amazon(str(root), "computers")
    g = ds.get(0)
    assert int(g.n_node[0]) == 10 and g.nodes.shape[1] == 4
    assert ds.num_classes >= 1


def test_citation_full_local_raw(tmp_path):
    root = tmp_path / "cf"
    raw = root / "cora_ml" / "raw"
    raw.mkdir(parents=True)
    _write_npz_graph(raw / "cora_ml.npz", n=8, f=3)
    ds = CitationFull(str(root), "cora_ml")
    assert ds.get(0).nodes.shape == (8, 3)


def test_reddit_local_raw(tmp_path):
    import scipy.sparse as sp

    root = tmp_path / "reddit"
    raw = root / "raw"
    raw.mkdir(parents=True)
    n = 12
    rng = np.random.default_rng(0)
    np.savez(raw / "reddit_data.npz",
             feature=rng.normal(size=(n, 5)).astype(np.float32),
             label=rng.integers(0, 4, n),
             node_types=np.asarray([1] * 6 + [2] * 3 + [3] * 3))
    adj = sp.random(n, n, density=0.4, random_state=1, format="csr")
    sp.save_npz(raw / "reddit_graph.npz", adj)
    ds = Reddit(str(root))
    g = ds.get(0)
    assert int(g.n_node[0]) == n
    assert ds.split_masks["train"].sum() == 6
    assert ds.split_masks["test"].sum() == 3


def test_modelnet_local_raw(tmp_path):
    root = tmp_path / "mn"
    for cat in ("chair", "table"):
        for split in ("train", "test"):
            d = root / "raw" / cat / split
            d.mkdir(parents=True)
            (d / "m0.off").write_text(
                "OFF\n3 1 0\n0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n")
    (root / "raw" / "categories.ok").write_text("ok")
    tr = ModelNet(str(root), "10", train=True)
    te = ModelNet(str(root), "10", train=False)
    assert len(tr._graphs) == 2 and len(te._graphs) == 2
    ys = sorted(int(g.y[0]) for g in tr._graphs)
    assert ys == [0, 1]


def test_faust_local_raw(tmp_path):
    root = tmp_path / "faust"
    d = root / "raw" / "MPI-FAUST" / "training" / "registrations"
    d.mkdir(parents=True)
    ply = ("ply\nformat ascii 1.0\nelement vertex 3\nproperty float x\n"
           "property float y\nproperty float z\nelement face 1\n"
           "property list uchar int vertex_indices\nend_header\n"
           "0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n")
    for i in range(100):
        (d / f"tr_reg_{i:03d}.ply").write_text(ply)
    tr = FAUST(str(root), train=True)
    te = FAUST(str(root), train=False)
    assert len(tr._graphs) == 80 and len(te._graphs) == 20
    # correspondence labels = vertex ids
    assert np.asarray(tr.get(0).y).tolist() == [0, 1, 2]


def test_ppi_local_raw(tmp_path):
    root = tmp_path / "ppi"
    raw = root / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for split in ("train", "valid", "test"):
        n = 8  # two graphs of 4
        gid = np.asarray([0, 0, 0, 0, 1, 1, 1, 1])
        links = [{"source": 0, "target": 1}, {"source": 2, "target": 3},
                 {"source": 4, "target": 5}, {"source": 6, "target": 7},
                 {"source": 5, "target": 5}]  # self-loop must be dropped
        with open(raw / f"{split}_graph.json", "w") as f:
            json.dump({"links": links}, f)
        np.save(raw / f"{split}_feats.npy",
                rng.normal(size=(n, 5)).astype(np.float32))
        np.save(raw / f"{split}_labels.npy",
                rng.integers(0, 2, (n, 3)).astype(np.float32))
        np.save(raw / f"{split}_graph_id.npy", gid)
    ds = PPI(str(root), split="train")
    assert len(ds._graphs) == 2
    g0, g1 = ds.get(0), ds.get(1)
    assert int(g0.n_node[0]) == 4 and int(g1.n_node[0]) == 4
    assert int(g1.n_edge[0]) == 4  # 2 real edges symmetrized, self-loop gone
    assert np.asarray(g0.y).shape == (4, 3)  # multi-label


def test_download_raises_cleanly(tmp_path):
    with pytest.raises(Exception, match="local files|registration"):
        Amazon(str(tmp_path / "a"), "photo")
    with pytest.raises(RuntimeError, match="registration"):
        FAUST(str(tmp_path / "f"))


def test_qm9_local_raw(tmp_path):
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets import QM9

    root = tmp_path / "qm9"
    raw = root / "raw"
    raw.mkdir(parents=True)
    mol = ("gdb_1\n prog\ncomment\n"
           "  3  2  0  0  0  0  0  0  0  0999 V2000\n"
           "    0.0  0.0  0.0 O 0 0\n"
           "    1.0  0.0  0.0 H 0 0\n"
           "   -1.0  0.0  0.0 H 0 0\n"
           "  1  2  1  0\n  1  3  1  0\nM  END\n")
    (raw / "gdb9.sdf").write_text(mol + "$$$$\n" + mol + "$$$$\n")
    (raw / "gdb9.sdf.csv").write_text(
        "mol_id," + ",".join(f"t{i}" for i in range(19)) + "\n"
        + "gdb_1," + ",".join(["1.5"] * 19) + "\n"
        + "gdb_2," + ",".join(str(float(v)) for v in range(19)) + "\n")
    ds = QM9(str(root))
    assert len(ds._graphs) == 2
    g = ds.get(1)
    assert int(g.n_node[0]) == 3
    assert g.globals.shape == (1, 19)
    HAR2EV = 27.2113825435
    # reference qm9.py target contract: reorder [3:]+[0:3], then convert —
    # target 7 = U0 (raw csv col 10) in eV; target 0 = mu (raw col 3), 1.0;
    # targets 16-18 = rotational constants A,B,C (raw cols 0-2), 1.0
    np.testing.assert_allclose(g.globals[0, 7], 10.0 * HAR2EV, rtol=1e-6)
    np.testing.assert_allclose(g.globals[0, 0], 3.0)
    np.testing.assert_allclose(g.globals[0, 16:19], [0.0, 1.0, 2.0])
