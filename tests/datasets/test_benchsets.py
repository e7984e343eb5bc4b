"""GNNBenchmarkDataset/MNISTSuperpixels over synthesized torch raws —
reference ``datasets/{gnn_benchmark_dataset,mnist_superpixels}.py``."""
import pickle
import sys
import types

import numpy as np

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets import (
    GNNBenchmarkDataset,
    MNISTSuperpixels,
)


def _save_pyg_style_archive(path, n_graphs=2, n=4, e=6, f=3):
    """torch.save a (Data, slices) tuple pickled under the
    torch_geometric module names, like the published raw archives."""
    import torch

    class Data:
        pass

    # register stub modules so pickling records torch_geometric paths
    added = []
    for name in ("torch_geometric", "torch_geometric.data",
                 "torch_geometric.data.data"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
            added.append(name)
    Data.__module__ = "torch_geometric.data.data"
    Data.__qualname__ = "Data"
    sys.modules["torch_geometric.data.data"].Data = Data
    sys.modules["torch_geometric.data"].Data = Data

    rng = np.random.default_rng(0)
    data = Data()
    data.x = torch.tensor(
        rng.normal(size=(n_graphs * n, f)).astype(np.float32))
    # collated storage keeps edge indices graph-local (PyG 1.x collate
    # concatenates without offsets; __inc__ only applies in DataLoader)
    ei = np.stack([rng.integers(0, n, n_graphs * e),
                   rng.integers(0, n, n_graphs * e)])
    data.edge_index = torch.tensor(ei, dtype=torch.long)
    data.edge_attr = torch.tensor(
        rng.normal(size=(n_graphs * e, 1)).astype(np.float32))
    data.y = torch.tensor(rng.integers(0, 5, n_graphs))
    data.pos = None
    slices = {
        "x": torch.arange(0, (n_graphs + 1) * n, n),
        "edge_index": torch.arange(0, (n_graphs + 1) * e, e),
        "edge_attr": torch.arange(0, (n_graphs + 1) * e, e),
        "y": torch.arange(n_graphs + 1),
    }
    try:
        torch.save((data, slices), path)
    finally:
        for name in added:
            del sys.modules[name]
    return np.asarray(data.y)


def test_gnn_benchmark_pattern(tmp_path):
    raw = tmp_path / "PATTERN" / "raw"
    raw.mkdir(parents=True)
    ys = {}
    for split in ("train", "val", "test"):
        ys[split] = _save_pyg_style_archive(raw / f"PATTERN_{split}.pt")
    tr = GNNBenchmarkDataset(str(tmp_path), "PATTERN", split="train")
    va = GNNBenchmarkDataset(str(tmp_path), "PATTERN", split="val")
    assert len(tr._graphs) == 2 and len(va._graphs) == 2
    g = tr.get(1)
    assert g.nodes.shape == (4, 3) and int(g.n_edge[0]) == 6
    assert int(np.asarray(g.senders).max()) < 4  # graph-local indices
    assert int(g.y[0]) == ys["train"][1]


def test_gnn_benchmark_csl(tmp_path):
    import scipy.sparse as sp
    import torch

    raw = tmp_path / "CSL" / "raw"
    raw.mkdir(parents=True)
    adj = sp.coo_matrix(np.asarray(
        [[1, 1, 0], [1, 0, 1], [0, 1, 0]]))  # one self-loop
    with open(raw / "graphs_Kary_Deterministic_Graphs.pkl", "wb") as f:
        pickle.dump([adj, adj], f)
    torch.save(torch.tensor([3, 1]),
               raw / "y_Kary_Deterministic_Graphs.pt")
    ds = GNNBenchmarkDataset(str(tmp_path), "CSL")
    assert len(ds._graphs) == 2
    g = ds.get(0)
    assert int(g.n_edge[0]) == 4  # self-loop removed
    assert int(g.y[0]) == 3


def test_mnist_superpixels_local_raw(tmp_path):
    import torch

    raw = tmp_path / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(0)
    m, n, e = 3, 75, 10
    for name in ("training.pt", "test.pt"):
        x = torch.tensor(rng.normal(size=(m, n)).astype(np.float32))
        ei = torch.tensor(
            np.stack([rng.integers(0, n, m * e),
                      rng.integers(0, n, m * e)]), dtype=torch.long)
        es = torch.arange(0, (m + 1) * e, e)
        pos = torch.tensor(rng.normal(size=(m, n, 2)).astype(np.float32))
        y = torch.tensor(rng.integers(0, 10, m))
        torch.save((x, ei, es, pos, y), raw / name)
    tr = MNISTSuperpixels(str(tmp_path), train=True)
    te = MNISTSuperpixels(str(tmp_path), train=False)
    assert len(tr._graphs) == 3 and len(te._graphs) == 3
    g = tr.get(0)
    assert g.nodes.shape == (75, 3)  # intensity + 2D pos
    assert int(g.n_edge[0]) == 10
    assert 0 <= int(g.y[0]) < 10
