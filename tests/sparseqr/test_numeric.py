"""Numeric multifrontal QR: factorization, Q application, solves.

Correctness witnesses mirror the reference's own (``qrtest.c:11-53``
solve-and-check) plus dense-oracle parity the reference never had:
RᵀR ≡ SᵀS (sign-free R check), NumPy-oracle vs batched-JAX parity,
Q isometry/round-trip, least-squares vs ``np.linalg.lstsq``, LQ min-norm.
"""
import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.sparseqr import (
    ORDER_NATURAL, analyze, factorize, factorize_numpy, least_squares,
    lq_min_norm_solve, qmult, rsolve,
)


def _random_sparse(m, n, density, seed):
    rng = np.random.default_rng(seed)
    A = sp.random(m, n, density=density, random_state=rng,
                  data_rvs=lambda k: rng.normal(size=k) + 0.1)
    diag = sp.coo_matrix(
        (rng.normal(size=min(m, n)) + 2.0,
         (np.arange(min(m, n)), np.arange(min(m, n)))), shape=(m, n))
    return (A + diag).tocsc()


def _rtr_relerr(F, A):
    S = sp.csc_matrix(A)[:, F.sym.q]
    R = F.R_csr()
    G = (R.T @ R).toarray()
    H = (S.T @ S).toarray()
    return np.abs(G - H).max() / max(np.abs(H).max(), 1e-30)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_numpy_oracle_rtr(seed):
    A = _random_sparse(70, 45, 0.08, seed)
    F = factorize_numpy(A)
    assert _rtr_relerr(F, A) < 1e-12
    assert F.rank == 45


def test_jax_matches_numpy_oracle():
    A = _random_sparse(60, 40, 0.1, 5)
    sym = analyze(A)
    Fn = factorize_numpy(A, sym=sym)
    Fj = factorize(A, sym=sym)
    Rn = np.abs(Fn.R_csr().toarray())
    Rj = np.abs(Fj.R_csr().toarray())
    # R is unique up to row signs for full-rank A
    assert np.allclose(Rn, Rj, atol=1e-3, rtol=1e-3)
    assert _rtr_relerr(Fj, A) < 1e-4
    assert Fj.rank == Fn.rank == 40


def test_orderings_all_factorize():
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu import native
    A = _random_sparse(80, 60, 0.06, 9)
    orderings = [ORDER_NATURAL]
    if native.native_available():
        orderings += [0, 1, 2, 3]
    for o in orderings:
        F = factorize(A, ordering=o)
        assert _rtr_relerr(F, A) < 1e-4, f"ordering {o}"


def test_qmult_isometry_and_roundtrip():
    A = _random_sparse(50, 30, 0.12, 11)
    F = factorize(A, keep_q=True)
    rng = np.random.default_rng(0)
    b = rng.normal(size=(50, 3)).astype(np.float32)
    y = qmult(F, b, "QTX")
    # Q is orthogonal: norms preserved column-wise
    assert np.allclose(np.linalg.norm(np.asarray(y), axis=0),
                       np.linalg.norm(b, axis=0), rtol=1e-5)
    back = qmult(F, y, "QX")
    assert np.allclose(np.asarray(back), b, atol=1e-5)


def test_qtx_consistent_with_r():
    # Qᵀ A(:,q) must equal [R; 0] in the factorization row space.
    A = _random_sparse(40, 25, 0.15, 13)
    F = factorize(A, keep_q=True)
    S = sp.csc_matrix(A)[:, F.sym.q].toarray().astype(np.float32)
    Y = np.asarray(qmult(F, S, "QTX"))
    R = F.R_csr().toarray()
    assert np.allclose(Y[:25], R, atol=2e-4)
    assert np.abs(Y[25:]).max(initial=0.0) < 2e-4


@pytest.mark.parametrize("nrhs", [1, 4])
def test_least_squares_matches_dense(nrhs):
    A = _random_sparse(90, 50, 0.08, 17)
    rng = np.random.default_rng(1)
    b = rng.normal(size=(90, nrhs)).astype(np.float32)
    if nrhs == 1:
        b = b[:, 0]
    x, F = least_squares(A, b)
    x_ref = np.linalg.lstsq(A.toarray(), b, rcond=None)[0]
    assert np.allclose(np.asarray(x), x_ref, atol=5e-3)


def test_rsolve_forward_and_backward():
    A = _random_sparse(45, 45, 0.1, 19)
    F = factorize(A)
    R = F.R_csr().toarray()
    rng = np.random.default_rng(2)
    c = rng.normal(size=(45, 2)).astype(np.float32)
    xb = np.asarray(rsolve(F, c))
    assert np.allclose(R @ xb, c, atol=1e-3)
    xf = np.asarray(rsolve(F, c, trans=True))
    assert np.allclose(R.T @ xf, c, atol=1e-3)


def test_rank_deficiency_detected():
    # duplicate a column: structural rank n−1
    A = _random_sparse(40, 20, 0.15, 23).toarray()
    A[:, 7] = A[:, 3]
    A = sp.csc_matrix(A)
    F = factorize(A)
    assert F.rank == 19
    # least squares still returns a finite minimizer
    rng = np.random.default_rng(3)
    b = rng.normal(size=40).astype(np.float32)
    x, _ = least_squares(A, b, F=None)
    x = np.asarray(x)
    assert np.isfinite(x).all()
    r = np.linalg.norm(A @ x - b)
    r_ref = np.linalg.norm(
        A.toarray() @ np.linalg.lstsq(A.toarray(), b, rcond=None)[0] - b)
    assert r <= r_ref * (1 + 1e-3) + 1e-3


def test_lq_min_norm_underdetermined():
    A = _random_sparse(25, 60, 0.12, 29)  # wide: min-norm solve
    rng = np.random.default_rng(4)
    b = rng.normal(size=25).astype(np.float32)
    x, _ = lq_min_norm_solve(A, b)
    x = np.asarray(x)
    assert np.allclose(A @ x, b, atol=5e-3)
    # min-norm: matches the pseudoinverse solution
    x_ref = np.linalg.pinv(A.toarray()) @ b
    assert np.linalg.norm(x) <= np.linalg.norm(x_ref) * (1 + 1e-3)


def test_real_matrix_solve_residual():
    """The reference's end-to-end witness on a shipped matrix
    (``Data/dwt_992.mtx``): factorize, solve AX=B for known X, report
    ‖X̂−X‖/n (``qrtest.c:11-53,196-201``)."""
    import os.path as osp
    path = osp.join(osp.dirname(__file__), "..", "..", "data", "matrices",
                    "dwt_992.mtx")
    if not osp.exists(path):
        pytest.skip("dwt_992.mtx not present")
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.io.mtx import (
        read_mtx, to_csr)
    t = read_mtx(path)
    A = sp.csc_matrix(to_csr(t)).astype(np.float64)
    # dwt_992 is a pattern matrix: shift to strict diagonal dominance so the
    # f32 solve is conditioning-limited by the method, not the instance
    rowsum = np.asarray(np.abs(A).sum(axis=1)).ravel()
    A = A + sp.diags(rowsum + 1.0)
    n = A.shape[1]
    x_true = np.ones(n, np.float32)
    b = (A @ x_true).astype(np.float32)
    x, F = least_squares(A, b, ordering=0 if _native() else ORDER_NATURAL)
    err = np.linalg.norm(np.asarray(x) - x_true) / n
    assert err < 1e-3
    assert F.rank == n


def _native():
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu import native
    return native.native_available()


def test_iterative_refinement_lifts_f32():
    """f32 factorization + float64-residual refinement — the TPU-native
    answer to the reference's float64 fronts (MXU is f32)."""
    A = _random_sparse(300, 300, 0.02, 31)
    # widen the dynamic range so plain f32 visibly lags
    A = A @ sp.diags(np.logspace(0, 3, 300))
    rng = np.random.default_rng(5)
    x_true = rng.normal(size=300)
    b = (A @ x_true).astype(np.float32)
    x0, F = least_squares(A, b)
    x2, _ = least_squares(A, b, F=F, refine=3)
    e0 = np.linalg.norm(np.asarray(x0, np.float64) - x_true)
    e2 = np.linalg.norm(np.asarray(x2) - x_true)
    assert e2 < e0 / 10
    # floor: b itself is f32-quantized, so κ·eps₃₂ bounds the best case
    assert e2 / np.linalg.norm(x_true) < 2e-4


def test_seminormal_qless_solve():
    """Q-less corrected-seminormal path matches the qmult path (and dense
    lstsq) without storing any Q — the memory-light large-scale route."""
    A = _random_sparse(120, 80, 0.06, 37)
    rng = np.random.default_rng(6)
    b = rng.normal(size=120).astype(np.float32)
    x_sn, F = least_squares(A, b, method="seminormal", refine=2)
    assert not F.keep_q  # genuinely Q-less
    x_ref = np.linalg.lstsq(A.toarray(), b, rcond=None)[0]
    assert np.allclose(np.asarray(x_sn), x_ref, atol=1e-4)


def test_deep_chain_tree_banded():
    """Tridiagonal-like band: the etree is a long chain (many levels) —
    exercises the level scheduler's deep path end-to-end."""
    n = 220
    A = (sp.diags(np.linspace(2, 3, n)) + sp.diags(np.ones(n - 1), 1)
         + sp.diags(0.5 * np.ones(n - 1), -1)).tocsc()
    sym = analyze(A, ORDER_NATURAL, nrelax=0, zrelax=0.0)
    assert len(sym.levels) > 10  # genuinely deep
    F = factorize(A, sym=sym)
    assert _rtr_relerr(F, A) < 1e-4
    rng = np.random.default_rng(7)
    b = rng.normal(size=n).astype(np.float32)
    x, _ = least_squares(A, b, method="seminormal", refine=2, sym=sym)
    assert np.allclose(A @ np.asarray(x, np.float64), b, atol=1e-4)


def test_refactorize_new_values_cached_symbolic():
    """analyze-once / factorize-many (the reference's QRsym reuse): same
    pattern, new values, cached plan + compiled program."""
    A1 = _random_sparse(50, 35, 0.1, 41)
    sym = analyze(A1)
    F1 = factorize(A1, sym=sym)
    A2 = A1.copy()
    A2.data = A2.data * 2.0 + 0.1
    F2 = factorize(A2, sym=sym)  # reuses sym._plan and sym._fused
    assert _rtr_relerr(F1, A1) < 1e-4
    assert _rtr_relerr(F2, A2) < 1e-4
    # and the two Rs genuinely differ (no stale-value reuse)
    assert not np.allclose(np.abs(F1.R_csr().toarray()),
                           np.abs(F2.R_csr().toarray()), atol=1e-3)


def test_heavy_rank_deficiency_damped_solve():
    """Half the columns dependent (the dwt_992 pattern-matrix regime):
    the unpivoted MXU front QR leaves O(|A|) mass in dead R rows, so
    least_squares must switch to the damped augmented system [A; lam*I]
    (see solve.py) instead of the discard-dead-rows basic solve, which
    produced residuals >1e9 on consistent systems."""
    rng = np.random.default_rng(11)
    B = _random_sparse(150, 50, 0.12, 31)
    A = sp.hstack([B, B]).tocsc()  # 100 cols, rank <= 50
    x_true = rng.normal(size=100)
    b = (A @ x_true).astype(np.float32)  # consistent: b in range(A)
    F = factorize(A, keep_q=True)
    assert F.rank <= 50
    bn = np.linalg.norm(b)
    for method in ("seminormal", "qmult"):
        x, _ = least_squares(A, b, F=F, method=method)
        r = np.linalg.norm(A @ np.asarray(x, np.float64) - b) / bn
        assert r < 1e-3, (method, r)
    x, _ = least_squares(A, b, F=F, method="seminormal", refine=2)
    r = np.linalg.norm(A @ np.asarray(x, np.float64) - b) / bn
    assert r < 1e-6, r


def test_damp_zero_keeps_basic_solution():
    # damp=0.0 forces the raw basic backsolve (finite, but no damping)
    A = _random_sparse(60, 30, 0.15, 7).toarray()
    A[:, 10] = A[:, 4]
    A = sp.csc_matrix(A)
    b = np.random.default_rng(5).normal(size=60).astype(np.float32)
    F = factorize(A, keep_q=True)
    x, F2 = least_squares(A, b, F=F, damp=0.0)
    assert np.isfinite(np.asarray(x)).all()
    assert F2 is F  # no augmented refactorization
