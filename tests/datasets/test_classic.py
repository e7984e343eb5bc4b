"""KarateClub / TU reader / SuiteSparse-local / OFF reader tests."""
import os
import numpy as np
import pytest

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets import (
    KarateClub,
    SuiteSparseMatrixCollection,
    TUDataset,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.io import read_off


def test_karate_club():
    g = KarateClub().get(0)
    assert int(g.n_node[0]) == 34
    assert int(g.n_edge[0]) == 156  # 78 undirected
    assert g.y.shape == (34,)
    # symmetric
    pairs = set(zip(g.senders.tolist(), g.receivers.tolist()))
    assert all((b, a) in pairs for a, b in pairs)


def test_tu_dataset_from_files(tmp_path):
    raw = tmp_path / "MUTAG" / "raw"
    os.makedirs(raw)
    # two graphs: triangle (label 0) and an edge pair (label 1)
    (raw / "MUTAG_A.txt").write_text("1, 2\n2, 1\n2, 3\n3, 2\n1, 3\n3, 1\n4, 5\n5, 4\n")
    (raw / "MUTAG_graph_indicator.txt").write_text("1\n1\n1\n2\n2\n")
    (raw / "MUTAG_graph_labels.txt").write_text("1\n-1\n")
    (raw / "MUTAG_node_labels.txt").write_text("0\n1\n0\n1\n1\n")
    ds = TUDataset(str(tmp_path / "MUTAG"), "MUTAG")
    assert len(ds) == 2
    g0 = ds.get(0)
    assert int(g0.n_node[0]) == 3 and int(g0.n_edge[0]) == 6
    assert g0.nodes.shape == (3, 2)  # one-hot node labels
    g1 = ds.get(1)
    assert int(g1.n_node[0]) == 2 and int(g1.n_edge[0]) == 2


def test_suite_sparse_local(tmp_path):
    ds = SuiteSparseMatrixCollection(
        str(tmp_path / "ss"), name="dwt_992", matrices_dir="data/matrices"
    )
    assert len(ds) == 1
    g = ds.get(0)
    assert int(g.n_node[0]) == 992


def test_read_off(tmp_path):
    p = tmp_path / "m.off"
    p.write_text("OFF\n4 2 0\n0 0 0\n1 0 0\n0 1 0\n0 0 1\n3 0 1 2\n3 0 2 3\n")
    g = read_off(str(p))
    assert int(g.n_node[0]) == 4
    assert int(g.n_edge[0]) == 12
