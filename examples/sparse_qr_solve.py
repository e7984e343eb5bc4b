#!/usr/bin/env python
"""End-to-end sparse least squares with the multifrontal QR — the
capability the reference's C stack provides through ``qrtest``
(``STMMQR/test/qrtest.c``), here as a library call: analyze → level-batched
factorize on the MXU → Qᵀb → R backsolve, plus the Q-less seminormal path
and LQ min-norm for wide systems.

Runs offline: uses ``data/matrices/dwt_992.mtx`` when present, else a
synthetic 2-D grid operator.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import numpy as np
import scipy.sparse as sp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu import sparseqr


def load_matrix():
    path = os.path.join(os.path.dirname(__file__), "..",
                        "data", "matrices", "dwt_992.mtx")
    if os.path.exists(path):
        from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.io.mtx import (
            read_mtx, to_csr)
        A = sp.csc_matrix(to_csr(read_mtx(path))).astype(np.float64)
        rowsum = np.asarray(np.abs(A).sum(axis=1)).ravel()
        return A + sp.diags(rowsum + 1.0), "dwt_992 (+diag dominance)"
    k = 24
    n = k * k
    main = sp.diags(np.full(n, 4.0))
    off = sp.diags(np.full(n - 1, -1.0), 1) + sp.diags(np.full(n - k, -1.0), k)
    return sp.csc_matrix(main + off + off.T), f"grid {k}x{k}"


def main():
    A, name = load_matrix()
    n = A.shape[1]
    print(f"matrix: {name}  ({A.shape[0]}x{n}, nnz={A.nnz})")

    t0 = time.time()
    sym = sparseqr.analyze(A, sparseqr.ORDER_AMD)
    print(f"analyze  {time.time()-t0:6.3f}s  fronts={len(sym.fronts)} "
          f"levels={len(sym.levels)} nnz(R)={sym.nnz_R}")

    t0 = time.time()
    F = sparseqr.factorize(A, sym=sym, keep_q=True)
    np.asarray(F.pool)
    print(f"factorize{time.time()-t0:6.3f}s  rank={F.rank}/{n}")

    rng = np.random.default_rng(0)
    x_true = rng.normal(size=n)
    b = (A @ x_true).astype(np.float32)

    x, _ = sparseqr.least_squares(A, b, F=F, refine=2)
    print(f"qmult solve     ‖x̂−x‖/‖x‖ = "
          f"{np.linalg.norm(np.asarray(x, np.float64)-x_true)/np.linalg.norm(x_true):.2e}")

    Fsn = sparseqr.factorize(A, sym=sym)  # Q-less
    x2, _ = sparseqr.least_squares(A, b, F=Fsn, method="seminormal", refine=2)
    print(f"seminormal (Q-less) ‖x̂−x‖/‖x‖ = "
          f"{np.linalg.norm(np.asarray(x2, np.float64)-x_true)/np.linalg.norm(x_true):.2e}")

    # wide system: LQ min-norm (SparseLQ.c role)
    Aw = sp.csc_matrix(A[: n // 3, :])
    bw = np.asarray((Aw @ x_true), np.float32)
    xw, _ = sparseqr.lq_min_norm_solve(Aw, bw)
    print(f"LQ min-norm residual ‖Ax−b‖/‖b‖ = "
          f"{np.linalg.norm(Aw @ np.asarray(xw, np.float64) - bw)/np.linalg.norm(bw):.2e}")


if __name__ == "__main__":
    main()
