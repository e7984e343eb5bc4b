"""Multifrontal sparse Cholesky — the reference's ``SparseChol_super_*``
routines (SURVEY C5 'full sparse Cholesky factorize/solve kept for
completeness'), TPU-native: LLᵀ reconstruction, solve vs dense, deep and
bushy trees, amalgamation variants."""
import numpy as np
import pytest
import scipy.sparse as sp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.sparseqr import (
    ORDER_NATURAL, analyze_spd, chol_solve, cholesky_factorize)


def _grid_laplacian(k, shift=0.2):
    n = k * k
    main = sp.diags(np.full(n, 4.0 + shift))
    off1 = sp.diags(np.full(n - 1, -1.0), 1)
    offk = sp.diags(np.full(n - k, -1.0), k)
    return sp.csc_matrix(main + off1 + offk + off1.T + offk.T)


def _random_spd(n, density, seed):
    rng = np.random.default_rng(seed)
    B = sp.random(n, n, density, random_state=rng,
                  data_rvs=lambda k: rng.normal(size=k))
    A = (B @ B.T).tocsc() + sp.eye(n) * (1.0 + n * density)
    return sp.csc_matrix(A)


def _llt_relerr(F, A):
    L = F.L_csr().toarray()
    P = np.asarray(F.sym.perm)
    Ap = A.toarray()[np.ix_(P, P)]
    return np.abs(L @ L.T - Ap).max() / np.abs(Ap).max()


@pytest.mark.parametrize("ordering", [ORDER_NATURAL, 0, 2])
def test_llt_reconstruction_grid(ordering):
    A = _grid_laplacian(12)
    F = cholesky_factorize(A, ordering=ordering)
    assert _llt_relerr(F, A) < 1e-4
    assert (F.diag > 0).all()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_llt_random_spd(seed):
    A = _random_spd(70, 0.08, seed)
    F = cholesky_factorize(A, ordering=ORDER_NATURAL)
    assert _llt_relerr(F, A) < 1e-4


def test_solve_matches_dense():
    A = _grid_laplacian(10)
    F = cholesky_factorize(A, ordering=0)
    rng = np.random.default_rng(1)
    b = rng.normal(size=(A.shape[0], 3)).astype(np.float32)
    x = chol_solve(F, b)
    x_ref = np.linalg.solve(A.toarray(), b)
    assert np.allclose(np.asarray(x), x_ref, atol=5e-3)


def test_solve_refined_tridiagonal_deep_tree():
    n = 300
    A = sp.csc_matrix(sp.diags(np.linspace(2.5, 4.0, n))
                      + sp.diags(np.ones(n - 1) * -1.0, 1)
                      + sp.diags(np.ones(n - 1) * -1.0, -1))
    sym = analyze_spd(A, ORDER_NATURAL, nrelax=0, zrelax=0.0)
    assert len(sym.levels) > 10
    F = cholesky_factorize(A, sym=sym)
    rng = np.random.default_rng(2)
    x_true = rng.normal(size=n)
    b = (A @ x_true).astype(np.float32)
    x = chol_solve(F, b, refine=2)
    assert np.linalg.norm(np.asarray(x, np.float64) - x_true) \
        / np.linalg.norm(x_true) < 1e-6


def test_amalgamation_consistency():
    A = _grid_laplacian(9)
    x_true = np.random.default_rng(3).normal(size=A.shape[0])
    b = (A @ x_true).astype(np.float32)
    for nrelax, zrelax in [(0, 0.0), (8, 0.4)]:
        sym = analyze_spd(A, 0, nrelax=nrelax, zrelax=zrelax)
        F = cholesky_factorize(A, sym=sym)
        x = chol_solve(F, b, refine=1)
        assert np.allclose(np.asarray(x, np.float64), x_true, atol=1e-4), \
            (nrelax, zrelax)


def test_refactorize_new_values():
    A1 = _random_spd(50, 0.1, 5)
    sym = analyze_spd(A1, ORDER_NATURAL)
    F1 = cholesky_factorize(A1, sym=sym)
    A2 = sp.csc_matrix(A1 * 2.0)
    F2 = cholesky_factorize(A2, sym=sym)
    assert _llt_relerr(F1, A1) < 1e-4
    assert _llt_relerr(F2, A2) < 1e-4
