#!/usr/bin/env python
"""Multifrontal sparse Cholesky solve — the reference's
``SparseChol_super_numeric`` + ``t_lsolve``/``t_ltsolve`` capability
(``STMMQR/src/chol/``): factor an SPD system once, solve many right-hand
sides, float32 fronts + float64-residual refinement."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import numpy as np
import scipy.sparse as sp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu import sparseqr


def load_spd():
    path = os.path.join(os.path.dirname(__file__), "..",
                        "data", "matrices", "bcsstk14.mtx")
    if os.path.exists(path):
        from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.io.mtx import (
            read_mtx, to_csr)
        A = sp.csc_matrix(to_csr(read_mtx(path))).astype(np.float64)
        return sp.csc_matrix((A + A.T) * 0.5), "bcsstk14 (SPD stiffness, κ≈1e10)"
    k = 30
    n = k * k
    main = sp.diags(np.full(n, 4.2))
    off1 = sp.diags(np.full(n - 1, -1.0), 1)
    offk = sp.diags(np.full(n - k, -1.0), k)
    return sp.csc_matrix(main + off1 + offk + off1.T + offk.T), f"grid {k}²"


def main():
    A, name = load_spd()
    n = A.shape[0]
    print(f"matrix: {name}  (n={n}, nnz={A.nnz})")

    t0 = time.time()
    sym = sparseqr.analyze_spd(A, ordering=0)
    print(f"analyze  {time.time()-t0:6.3f}s  fronts={len(sym.fronts)} "
          f"levels={len(sym.levels)} nnz(L)={sym.nnz_L}")

    t0 = time.time()
    F = sparseqr.cholesky_factorize(A, sym=sym)
    F.pool.block_until_ready()
    print(f"factorize{time.time()-t0:6.3f}s (incl. compile)")
    t0 = time.time()
    F = sparseqr.cholesky_factorize(A, sym=sym)
    F.pool.block_until_ready()
    print(f"re-factor{time.time()-t0:6.3f}s (steady state)")

    rng = np.random.default_rng(0)
    X = rng.normal(size=(n, 4))
    B = (A @ X).astype(np.float32)
    t0 = time.time()
    Xh = sparseqr.chol_solve(F, B, refine=4)
    print(f"solve    {time.time()-t0:6.3f}s (4 rhs, incl. compile)")
    err = np.linalg.norm(np.asarray(Xh, np.float64) - X) / np.linalg.norm(X)
    print(f"relative error ‖X̂−X‖/‖X‖ = {err:.2e} "
          f"(f32 fronts + f64-residual refinement; κ≈1e10)")
    assert err < 1e-3


if __name__ == "__main__":
    main()
