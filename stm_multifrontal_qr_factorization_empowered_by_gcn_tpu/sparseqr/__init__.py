"""TPU-native multifrontal sparse QR.

Role equivalent of the reference's STMMQR solver stack
(``STMMQR/src/qr/SparseQR.c``, ``SparseQR_analyze.c``,
``SparseQR_factorize.c``, ``SparseLQ.c`` — SURVEY.md C2/C3/C4/C11),
re-designed TPU-first instead of translated:

* **Symbolic analysis** (host, NumPy): column elimination tree of AᵀA,
  postorder, per-column R row patterns, supernodal fronts with relaxed
  amalgamation, and a *level schedule* — all fronts at the same etree
  height are independent and are padded into same-shape buckets.  This
  replaces the reference's flop-weighted streaming task mapping
  (``SparseQR_analyze.c:705-1165``): on TPU the unit of parallelism is a
  *batched dense front*, not a pthread task.
* **Numeric factorization** (device, JAX): per level, fronts are
  assembled by pure gather/scatter (multifrontal QR assembly is row
  stacking — no extend-add collisions) and factorized as one batched
  Householder QR (``lax.linalg.geqrf``) that runs on the MXU.  This is
  the TPU analog of the reference's ``qr_kernel`` hot loop
  (``SparseQR_factorize.c:791-985``: assemble → dlarfg/dlarft/dlarfb →
  pack) with the TPSM task tree (C9/C10) replaced by level-batched XLA.
* **Solve layer**: Householder Q application (``QR_qmult`` role,
  ``SparseQR.c:1838``), R back/forward-solve (``QR_solve``/``qr_rsolve``
  role, ``SparseQR.c:2118``), dense-front least squares, and LQ /
  min-norm solve (``SparseLQ.c:691`` role) via QR of Aᵀ.
"""
from .symbolic import (
    ORDER_AMD,
    ORDER_COLAMD,
    ORDER_METIS,
    ORDER_NESDIS,
    ORDER_NATURAL,
    ORDER_GIVEN,
    SymbolicQR,
    analyze,
    analyze_best,
    column_etree,
    postorder,
)
from .numeric import (
    QRFactorization, factorize, factorize_numpy, factorize_taskparallel,
)
from .solve import qmult, rsolve, least_squares, lq_min_norm_solve
from .cholesky import (
    CholFactorization, analyze_spd, chol_solve, cholesky_factorize,
)

__all__ = [
    "ORDER_AMD", "ORDER_COLAMD", "ORDER_METIS", "ORDER_NESDIS",
    "ORDER_NATURAL", "ORDER_GIVEN",
    "SymbolicQR", "analyze", "analyze_best", "column_etree", "postorder",
    "QRFactorization", "factorize", "factorize_numpy",
    "factorize_taskparallel",
    "qmult", "rsolve", "least_squares", "lq_min_norm_solve",
    "CholFactorization", "analyze_spd", "chol_solve", "cholesky_factorize",
]
