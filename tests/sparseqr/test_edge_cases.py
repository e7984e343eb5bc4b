"""Edge-case battery for the multifrontal QR — shapes and patterns the
reference's C code handles implicitly (singletons, empty rows/columns,
duplicates, extreme aspect ratios)."""
import numpy as np
import pytest
import scipy.sparse as sp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.sparseqr import (
    ORDER_NATURAL, analyze, factorize, factorize_numpy, least_squares,
    qmult)


def _rtr_ok(F, A, tol=1e-4):
    S = sp.csc_matrix(A)[:, F.sym.q]
    R = F.R_csr()
    G = (R.T @ R).toarray()
    H = (S.T @ S).toarray()
    denom = max(np.abs(H).max(), 1e-30)
    assert np.abs(G - H).max() / denom < tol


def test_one_by_one():
    A = sp.csc_matrix(np.array([[3.0]]))
    F = factorize(A, ordering=ORDER_NATURAL)
    assert F.rank == 1
    x, _ = least_squares(A, np.asarray([6.0], np.float32), F=None,
                         ordering=ORDER_NATURAL)
    assert np.allclose(np.asarray(x), [2.0], atol=1e-5)


def test_single_column_tall():
    A = sp.csc_matrix(np.arange(1, 6, dtype=float).reshape(5, 1))
    F = factorize(A, ordering=ORDER_NATURAL, keep_q=True)
    _rtr_ok(F, A)
    b = np.asarray([1, 2, 3, 4, 5], np.float32)
    x, _ = least_squares(A, b, F=F)
    x_ref = np.linalg.lstsq(A.toarray(), b, rcond=None)[0]
    assert np.allclose(np.asarray(x), x_ref, atol=1e-4)


def test_empty_rows_and_columns():
    rng = np.random.default_rng(0)
    A = sp.random(30, 20, 0.15, random_state=rng).tolil()
    A[7, :] = 0   # empty row
    A[:, 11] = 0  # empty column (structurally dead)
    A = sp.csc_matrix(A)
    F = factorize(A, ordering=ORDER_NATURAL, keep_q=True)
    _rtr_ok(F, A)
    assert F.rank <= 19
    # Q round-trip must preserve the empty row's entry
    b = rng.normal(size=30).astype(np.float32)
    y = qmult(F, b, "QTX")
    back = qmult(F, y, "QX")
    assert np.allclose(np.asarray(back), b, atol=1e-5)


def test_duplicate_entries_summed():
    rows = np.array([0, 0, 1, 2, 2, 2])
    cols = np.array([0, 0, 1, 2, 2, 0])
    vals = np.array([1.0, 2.0, 4.0, 1.5, 1.5, 5.0])
    A = sp.csc_matrix((vals, (rows, cols)), shape=(3, 3))
    F = factorize(A, ordering=ORDER_NATURAL)
    dense = np.zeros((3, 3))
    for r, c, v in zip(rows, cols, vals):
        dense[r, c] += v
    _rtr_ok(F, sp.csc_matrix(dense), tol=1e-5)


def test_diagonal_matrix_trivial_tree():
    d = np.asarray([3.0, -2.0, 5.0, 1.0])
    A = sp.diags(d).tocsc()
    F = factorize(A, ordering=ORDER_NATURAL)
    assert np.allclose(np.abs(F.diag), np.abs(d), atol=1e-6)
    assert F.rank == 4


def test_very_wide_and_very_tall():
    rng = np.random.default_rng(3)
    wide = sp.random(5, 200, 0.2, random_state=rng,
                     data_rvs=lambda k: rng.normal(size=k) + 0.5).tocsc()
    F = factorize(wide, ordering=ORDER_NATURAL)
    assert F.rank <= 5
    _rtr_ok(F, wide, tol=1e-3)
    tall = sp.csc_matrix(wide.T)
    F2 = factorize(tall, ordering=ORDER_NATURAL)
    _rtr_ok(F2, tall, tol=1e-3)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_random_patterns(seed):
    """Random shapes/densities: JAX path must match the float64 oracle."""
    rng = np.random.default_rng(100 + seed)
    m = int(rng.integers(5, 120))
    n = int(rng.integers(5, 120))
    dens = float(rng.uniform(0.02, 0.25))
    A = sp.random(m, n, dens, random_state=rng,
                  data_rvs=lambda k: rng.normal(size=k))
    A = sp.csc_matrix(A)
    sym = analyze(A, ORDER_NATURAL)
    Fj = factorize(A, sym=sym)
    Fn = factorize_numpy(A, sym=analyze(A, ORDER_NATURAL))
    Rj = np.abs(Fj.R_csr().toarray())
    Rn = np.abs(Fn.R_csr().toarray())
    scale = max(Rn.max(initial=0.0), 1e-30)
    assert np.abs(Rj - Rn).max() / scale < 5e-3


def test_given_ordering_roundtrip():
    rng = np.random.default_rng(9)
    A = sp.random(40, 25, 0.2, random_state=rng) + sp.eye(40, 25) * 2
    A = sp.csc_matrix(A)
    perm = rng.permutation(25)
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.sparseqr import (
        ORDER_GIVEN)
    sym = analyze(A, ORDER_GIVEN, given=perm)
    F = factorize(A, sym=sym)
    _rtr_ok(F, A)
    b = rng.normal(size=40).astype(np.float32)
    x, _ = least_squares(A, b, F=None, ordering=ORDER_GIVEN, given=perm,
                         method="seminormal", refine=1)
    x_ref = np.linalg.lstsq(A.toarray(), b, rcond=None)[0]
    assert np.allclose(np.asarray(x), x_ref, atol=1e-3)


def test_least_squares_returns_callers_handle():
    """The damped fallback must not swap the caller's handle for the
    augmented-system factorization (which masks rank deficiency and
    describes [A; lam*I], not A) — and the cache must live on the
    caller's handle so repeat solves skip the refactorization."""
    import time

    import numpy as np
    import scipy.sparse as sp

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu import sparseqr

    rng = np.random.default_rng(0)
    n = 60
    # rank-deficient: duplicate half the columns
    B = rng.normal(size=(n, n // 2))
    A = sp.csc_matrix(np.hstack([B, B]))
    F = sparseqr.factorize(A)
    assert F.rank < A.shape[1]
    b = (A @ rng.normal(size=A.shape[1])).astype(np.float32)
    x, F_out = sparseqr.least_squares(A, b, F=F, method="seminormal")
    assert F_out is F, "caller's handle must be returned"
    assert F_out.rank < A.shape[1], "rank info must describe A"
    assert F.damped is not None, "damped cache populated on the handle"
    cached = F.damped[2]
    x2, _ = sparseqr.least_squares(A, b, F=F, method="seminormal")
    assert F.damped[2] is cached, "repeat solve reuses the cached F_aug"
    r = np.linalg.norm(A @ np.asarray(x, np.float64) - b) / np.linalg.norm(b)
    assert r < 1e-3


def test_refine_converges_on_damped_path():
    # iterated Tikhonov: refinement against the ORIGINAL system residual
    # (augmented rows zeroed) must reach the f64 floor instead of the
    # ridge-biased O(lam^2/sigma^2) plateau (round-5 fix)
    import scipy.sparse as sp

    rng = np.random.default_rng(0)
    A = sp.random(60, 25, density=0.3, random_state=0, format="csc")
    A = sp.hstack([A, A[:, :4]]).tocsc()  # rank deficient
    x_true = rng.normal(size=29)
    b = np.asarray(A @ x_true, np.float64)
    x, _ = least_squares(A, b.astype(np.float32), refine=2,
                         method="seminormal")
    r = np.linalg.norm(A @ np.asarray(x, np.float64) - b) / np.linalg.norm(b)
    assert r < 1e-6


def test_equilibrated_solve_on_badly_scaled_system():
    # rows spanning ~e+-10 stall f32 refinement near 1e-4; exact power-of-2
    # equilibration restores the kappa*eps32 contraction (round-5; the
    # reference absorbs this with f64 fronts instead, qrtest.c:196-201)
    import scipy.sparse as sp

    rng = np.random.default_rng(1)
    n = 150
    A = sp.random(n, n, density=0.04, random_state=1, format="csc") + sp.eye(n)
    A = (sp.diags(np.exp(rng.normal(0.0, 8.0, n))) @ A).tocsc()
    x_true = rng.normal(size=n)
    b = np.asarray(A @ x_true, np.float64)
    F = factorize(A)
    x, _ = least_squares(A, b.astype(np.float32), F=F, refine=3,
                         method="seminormal", equilibrate=True)
    r = np.linalg.norm(A @ np.asarray(x, np.float64) - b) / np.linalg.norm(b)
    assert r < 1e-6
    # cached scaled factorization is reused on the second call
    assert F.scaled is not None
    x2, _ = least_squares(A, b.astype(np.float32), F=F, refine=3,
                          method="seminormal", equilibrate=True)
    assert np.allclose(np.asarray(x), np.asarray(x2))
