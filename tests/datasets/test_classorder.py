"""Classorder dataset tests: lifecycle, normalization, deterministic splits
(reference behaviour minus the unseeded shuffle — SURVEY.md §3.6)."""
import os.path as osp

import numpy as np
import pytest

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets import (
    Classorder,
    synthesize_features,
)


@pytest.fixture
def tiny_root(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(7)
    rows = []
    for gid in range(12):
        n = int(rng.integers(10, 40))
        nnz = int(n + rng.integers(n, 4 * n))
        rows.append([gid, n, nnz, nnz / n**2, (nnz - n) / n, 0.1, 0.1, 6, 0, 6, 0])
    np.savetxt(raw / "QR_extinfo.txt", np.array(rows))
    np.savetxt(
        raw / "graph_y.txt",
        np.stack([np.arange(12), rng.integers(0, 4, 12)], 1),
        fmt="%d",
    )
    return str(tmp_path)


def test_process_and_splits(tiny_root):
    tr = Classorder(tiny_root, 0, split_seed=3)
    va = Classorder(tiny_root, 1, split_seed=3)
    te = Classorder(tiny_root, 2, split_seed=3)
    assert len(tr) + len(va) + len(te) == 12
    assert len(tr) == 8  # 2/3
    assert tr.num_features == 5 and tr.num_classes >= 1


def test_feature_normalization(tiny_root):
    tr = Classorder(tiny_root, 0, split_seed=3)
    for g in tr:
        x = np.asarray(g.nodes)
        assert x[:, 2:5].max() <= 1.0  # x/(max+1) < 1
        assert x[:, 2:5].min() >= 0.0
        # column 0 is the graph id, constant per graph
        assert len(set(x[:, 0].tolist())) == 1


def test_split_determinism(tiny_root, tmp_path):
    a = Classorder(tiny_root, 0, split_seed=3)
    ids_a = sorted(int(np.asarray(g.nodes)[0, 0]) for g in a)
    b = Classorder(tiny_root, 0, split_seed=3)  # cached load
    ids_b = sorted(int(np.asarray(g.nodes)[0, 0]) for g in b)
    assert ids_a == ids_b


def test_synth_structure_matches_stats():
    ext = np.array([200, 1400, 1400 / 200**2, 6.0, 0.05, 0.05, 12, 0, 12, 0])
    gf = synthesize_features(ext, seed=5)
    assert gf.nrow == 200
    nnz = len(gf.rows)
    assert abs(nnz - 1400) / 1400 < 0.35  # edge count in the right ballpark
    assert gf.rdeg.max() <= 12
    # deterministic
    gf2 = synthesize_features(ext, seed=5)
    np.testing.assert_array_equal(gf.rows, gf2.rows)


def test_globals_are_raw_extinfo(tiny_root):
    tr = Classorder(tiny_root, 0, split_seed=3)
    g = tr[0]
    glob = np.asarray(g.globals)
    assert glob.shape == (1, 14)  # 10 extinfo + 4 optional fills
    gid = int(np.asarray(g.nodes)[0, 0])
    ext = np.loadtxt(osp.join(tiny_root, "raw", "QR_extinfo.txt"))
    np.testing.assert_allclose(glob[0, :10], ext[gid, 1:], rtol=1e-6)
