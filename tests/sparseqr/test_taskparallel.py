"""Task-parallel multifrontal QR across mesh devices — the reference's
TPSM streaming task mapping (``SparseQR_multithreads.c``,
``SparseQR_analyze.c:705-860``) retargeted at devices.  Runs on the test
suite's 8 virtual CPU devices; must reproduce the single-device factor."""
import numpy as np
import pytest
import scipy.sparse as sp

import jax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.sparseqr import (
    ORDER_NATURAL, analyze, factorize, factorize_taskparallel,
    least_squares)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.sparseqr.symbolic import (
    partition_tasks)


def _grid(k):
    n = k * k
    main = sp.diags(np.linspace(2.0, 4.0, n))
    off1 = sp.diags(np.ones(n - 1) * -0.7, 1)
    offk = sp.diags(np.ones(n - k) * -0.3, k)
    return sp.csc_matrix(main + off1 + offk + off1.T + offk.T)


def test_partition_balance_and_closure():
    A = _grid(24)
    sym = analyze(A, 2)  # ND → bushy tree
    P = 4
    g = partition_tasks(sym, P)
    assert set(np.unique(g)) <= set(range(P + 1))
    # closure: non-top groups contain whole subtrees
    for f in sym.fronts:
        for c in f.children:
            if g[f.fid] < P:
                assert g[c] == g[f.fid]
    # rough balance: the busiest group ≤ 4× the lightest nonempty one
    flops = np.zeros(P)
    for f in sym.fronts:
        if g[f.fid] < P:
            flops[g[f.fid]] += f.fn * f.fn * max(f.fm, f.fn)
    nz = flops[flops > 0]
    if len(nz) > 1:
        assert nz.max() / nz.min() < 8


@pytest.mark.parametrize("ordering", [ORDER_NATURAL, 2])
def test_taskparallel_matches_single_device(ordering):
    A = _grid(16)
    sym1 = analyze(A, ordering)
    F1 = factorize(A, sym=sym1)
    R1 = np.abs(F1.R_csr().toarray())

    sym2 = analyze(A, ordering)
    devs = jax.devices()
    assert len(devs) >= 4, "test mesh should expose multiple devices"
    F2 = factorize_taskparallel(A, sym=sym2, devices=devs[:4])
    R2 = np.abs(F2.R_csr().toarray())
    assert np.allclose(R1, R2, atol=2e-4, rtol=1e-3)
    assert F2.rank == F1.rank

    # the task-parallel pool feeds the standard solve paths
    rng = np.random.default_rng(0)
    b = rng.normal(size=A.shape[0]).astype(np.float32)
    x, _ = least_squares(A, b, F=F2, method="seminormal", refine=1)
    assert np.allclose(A @ np.asarray(x, np.float64), b, atol=1e-3)
