"""Feature-generator golden tests: bit-exact parity with the reference C
generator's published outputs (``SparseCore_read_write.c:1040-1190``) on the
vendored Classtest matrices."""
import os.path as osp

import numpy as np
import pytest

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.io import (
    compute_features,
    features_from_mtx,
    node_feature_table,
    read_mtx,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.io.mtx import Triplets

DATA = osp.join(osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))), "data")


def test_eli_add_tiny_hand_example():
    # 3-node directed cycle 0→1→2→0 plus full diagonal.
    rows = np.array([0, 1, 2, 0, 1, 2])
    cols = np.array([1, 2, 0, 0, 1, 2])
    t = Triplets(rows, cols, np.ones(6), 3, 3, False)
    gf = compute_features(t)
    np.testing.assert_array_equal(gf.rdeg, [1, 1, 1])
    np.testing.assert_array_equal(gf.cdeg, [1, 1, 1])
    # eliminating node 1: in={0}, out={2}; edge (0,2) absent → adds 1·1−0=1
    np.testing.assert_array_equal(gf.eli_add, [1, 1, 1])


def test_eli_add_discounts_existing_edges():
    # 0→1, 1→2, 0→2 (triangle shortcut) + diagonal
    rows = np.array([0, 1, 0, 0, 1, 2])
    cols = np.array([1, 2, 2, 0, 1, 2])
    t = Triplets(rows, cols, np.ones(6), 3, 3, False)
    gf = compute_features(t)
    # node 1: in={0}, out={2}, edge (0,2) exists → eli_add = 1 - 1 = 0
    assert gf.eli_add[1] == 0


@pytest.mark.parametrize(
    "name,gid",
    [("lns_3937.mtx", 2), ("ex18.mtx", 0), ("t2d_q9.mtx", 4)],
)
def test_golden_parity_with_c_generator(name, gid):
    path = osp.join(DATA, "matrices", name)
    if not osp.exists(path):
        pytest.skip("vendored matrices missing")
    gf = features_from_mtx(path)
    ext = np.loadtxt(osp.join(DATA, "Classtest", "raw", "QR_extinfo.txt"))
    ref = ext[ext[:, 0] == gid][0, 1:]
    np.testing.assert_allclose(gf.extinfo, ref, rtol=1e-4)

    content = np.loadtxt(osp.join(DATA, "Classtest", "raw", "classorder.content"))
    rows = content[content[:, 0] == gid]
    rows = rows[rows[:, 1].argsort()]
    mine = node_feature_table(gf, gid)
    np.testing.assert_array_equal(rows[:, 2], mine[: len(rows), 2])  # out-deg
    np.testing.assert_array_equal(rows[:, 3], mine[: len(rows), 3])  # in-deg
    np.testing.assert_array_equal(rows[:, 4], mine[: len(rows), 4])  # eli_add


def test_symmetric_expansion():
    path = osp.join(DATA, "matrices", "dwt_992.mtx")
    if not osp.exists(path):
        pytest.skip("vendored matrices missing")
    t = read_mtx(path)
    # symmetric: every offdiag (i,j) must have (j,i)
    off = t.rows != t.cols
    fwd = set(zip(t.rows[off].tolist(), t.cols[off].tolist()))
    assert all((j, i) in fwd for i, j in list(fwd)[:500])
