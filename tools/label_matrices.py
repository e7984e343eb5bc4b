#!/usr/bin/env python
"""Brute-force ordering labeler — offline data tooling.

Capability of the reference's ``-Dall_methods_time`` build
(``STMMQR/src/chol/SparseChol_analyze.c:429-613``): for every ``.mtx`` it
evaluates the symbolic fill (lnz) of the QR's AᵀA Cholesky under each
candidate ordering {min-degree (AMD role), column-MD (COLAMD role),
nested dissection (METIS role), deep-ND (NESDIS role)} and writes:

* ``graph_y.txt``           — ``graph_id best_class`` per matrix,
* ``Brute-force-fill.txt``  — per-method lnz per matrix
  (the reference's ``Results/Brute-force-fill.txt`` format role).

Usage: python tools/label_matrices.py data/matrices --out Results
"""
import argparse
import glob
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("matrices_dir")
    ap.add_argument("--out", default="Results")
    ap.add_argument("--start-id", type=int, default=0)
    args = ap.parse_args()

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu import native
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.io.mtx import read_mtx

    if not native.build_native():
        raise SystemExit("could not build native library (need g++)")

    os.makedirs(args.out, exist_ok=True)
    paths = sorted(glob.glob(osp.join(args.matrices_dir, "*.mtx")))
    fy = open(osp.join(args.out, "graph_y.txt"), "w")
    ff = open(osp.join(args.out, "Brute-force-fill.txt"), "w")
    for gid, p in enumerate(paths, start=args.start_id):
        t0 = time.time()
        t = read_mtx(p)
        best, fills = native.label_matrix(
            t.rows.astype(np.int32), t.cols.astype(np.int32), t.nrow, t.ncol
        )
        fy.write(f"{gid}\t{best}\n")
        ff.write(
            f"{gid}\t{osp.basename(p)}\t"
            + "\t".join(str(fills[k]) for k in sorted(fills))
            + "\n"
        )
        class_names = {0: "amd", 1: "colamd", 2: "metis-nd", 3: "nesdis"}
        print(
            f"{gid} {osp.basename(p)}: best={best} "
            f"({class_names[best]}) fills={fills} "
            f"[{time.time()-t0:.2f}s]"
        )
    fy.close()
    ff.close()


if __name__ == "__main__":
    main()
