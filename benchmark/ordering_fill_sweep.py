#!/usr/bin/env python
"""Fill parity + analyze-time sweep: supervariable `amd_fast` solver path
vs the labeler's exact-order quotient-graph MD, per sweep matrix.

The reference keeps one AMD (``STMMQR/src/base/amd.c``) because it only
needs speed; this framework keeps TWO modes — the exact elimination order
(training-label generator) and the supervariable fast mode (solver path,
``native/ordering.cpp::amd_fast``) — so this sweep is the witness that the
fast mode's fill stays at parity (or better) while analyze time drops to
reference-like milliseconds.

Host-side only (symbolic analysis never touches the TPU).

Usage: python benchmark/ordering_fill_sweep.py [--dir data/matrices]
"""
import argparse
import glob
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import scipy.sparse as sp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="data/matrices")
    ap.add_argument("--matrices", nargs="*", default=None)
    args = ap.parse_args()

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu import (
        native,
        sparseqr,
    )
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.io.mtx import (
        read_mtx,
        to_csr,
    )
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.sparseqr.symbolic import (
        _ata_graph,
    )

    paths = sorted(glob.glob(osp.join(args.dir, "*.mtx")))
    if args.matrices:
        paths = [p for p in paths
                 if osp.splitext(osp.basename(p))[0] in args.matrices]

    print(f"{'matrix':<18}{'mode':<14}{'order(s)':>9}{'ana(s)':>8}"
          f"{'nnz_R':>10}{'flops':>12}{'fill vs exact':>14}")
    for path in paths:
        name = osp.splitext(osp.basename(path))[0]
        A = sp.csc_matrix(to_csr(read_mtx(path))).astype(np.float64)
        m, n = A.shape
        coo = A.tocoo()
        s, d = _ata_graph(A)

        modes = {
            "amd-exact": lambda: native.order(
                s, d, n, native.METHOD_MIN_DEGREE),
            "amd-fast": lambda: native.order_fast(s, d, n),
            "colamd-exact": lambda: native.col_order(coo.row, coo.col, m, n),
            "colamd-fast": lambda: native.col_order_fast(
                coo.row, coo.col, m, n),
        }
        base = {}
        for mode, fn in modes.items():
            t0 = time.time()
            q = fn().astype(np.int64)
            t_ord = time.time() - t0
            t0 = time.time()
            sym = sparseqr.analyze(A, sparseqr.ORDER_GIVEN, given=q)
            t_ana = time.time() - t0
            fam = mode.split("-")[0]
            if mode.endswith("exact"):
                base[fam] = sym.nnz_R
            rel = sym.nnz_R / base[fam] - 1.0
            print(f"{name:<18}{mode:<14}{t_ord:>9.3f}{t_ana:>8.3f}"
                  f"{sym.nnz_R:>10}{sym.flops:>12.3e}{rel:>+13.1%}",
                  flush=True)


if __name__ == "__main__":
    main()
