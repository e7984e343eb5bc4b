"""Native (C++) symbolic analysis must match the pure-Python oracle
front-for-front (native/qr_symbolic.cpp vs sparseqr/symbolic.py)."""
import numpy as np
import pytest
import scipy.sparse as sp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu import native
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.sparseqr import (
    ORDER_NATURAL, analyze)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.sparseqr import (
    symbolic as sym_mod)

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native library unavailable")


def _rand(m, n, density, seed):
    rng = np.random.default_rng(seed)
    A = sp.random(m, n, density=density, random_state=rng)
    diag = sp.coo_matrix((np.ones(min(m, n)),
                          (np.arange(min(m, n)), np.arange(min(m, n)))),
                         shape=(m, n))
    return (A + diag).tocsc()


@pytest.mark.parametrize("seed,shape,density,relax", [
    (0, (60, 40), 0.08, (4, 0.25)),
    (1, (100, 100), 0.04, (4, 0.25)),
    (2, (80, 50), 0.1, (0, 0.0)),
    (3, (40, 70), 0.1, (8, 0.4)),
])
def test_native_matches_python_fronts(seed, shape, density, relax):
    A = _rand(*shape, density, seed)
    nat = analyze(A, ORDER_NATURAL, nrelax=relax[0], zrelax=relax[1])
    sym_mod._FORCE_PYTHON = True
    try:
        ref = analyze(A, ORDER_NATURAL, nrelax=relax[0], zrelax=relax[1])
    finally:
        sym_mod._FORCE_PYTHON = False
    assert len(nat.fronts) == len(ref.fronts)
    assert np.array_equal(nat.q, ref.q)
    for fn_, fr in zip(nat.fronts, ref.fronts):
        assert np.array_equal(fn_.pivots, fr.pivots)
        assert np.array_equal(fn_.cols, fr.cols)
        assert np.array_equal(np.sort(fn_.srows), np.sort(fr.srows))
        assert fn_.parent == fr.parent
        assert (fn_.fm, fn_.cb_rows, fn_.level) == (fr.fm, fr.cb_rows, fr.level)
    assert nat.nnz_R == ref.nnz_R
    assert nat.flops == ref.flops
