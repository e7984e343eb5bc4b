#!/usr/bin/env python
"""Relabel a generated corpus with the SOLVER's own orderings.

The corpus labels (`graph_y.txt` / `fills.txt`) rank the exact-mode
labeler's fills, but the deployed solver (`sparseqr.analyze`) runs the
supervariable fast orderings (`amd_fast`/`col_order_fast`) whose fill
landscape ranks differently (round-4 change: −25–50 % fill).  A model
trained on labeler fills picks orderings that are optimal for a solver
nobody runs — measured as +19.3 % model-vs-optimum flops in
`eval_time.py` while the labeler-fill regret reads +3.6 %.

This tool recomputes, per matrix, the four candidate orderings exactly as
`sparseqr.symbolic._fill_reducing_q` produces them and scores each with
the O(nnz·α) GNP column counts (`ordering_score` — the same metric
`analyze_best` picks by).  Output: a sibling corpus root
``<root>S/raw/{QR_extinfo.txt,graph_y.txt,fills.txt}`` with
solver-aligned labels and flop-proxy fills (consumed by the fill-regret
loss), sharing the original matrices directory.

Usage: python tools/relabel_solver.py data/ClassorderGen [more roots...]
"""
import argparse
import glob
import os
import os.path as osp
import shutil
import sys
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import scipy.sparse as sp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("roots", nargs="+")
    ap.add_argument("--threads", type=int, default=4)
    args = ap.parse_args()

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.io.mtx import (
        read_mtx, to_csr)
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.sparseqr.symbolic import (
        _ata_graph, _fill_reducing_q, ordering_score)

    for root in args.roots:
        mdir = osp.join(root, "matrices")
        ext = np.atleast_2d(np.loadtxt(osp.join(root, "raw", "QR_extinfo.txt")))
        index = {}
        for p in sorted(glob.glob(osp.join(mdir, "*.mtx"))):
            t = read_mtx(p)
            index[(t.nrow, len(t.rows))] = p

        out_root = root.rstrip("/") + "S"
        os.makedirs(osp.join(out_root, "raw"), exist_ok=True)
        shutil.copy(osp.join(root, "raw", "QR_extinfo.txt"),
                    osp.join(out_root, "raw", "QR_extinfo.txt"))

        def score_one(row):
            gid = int(row[0])
            key = (int(row[1]), int(row[2]))
            p = index.get(key)
            if p is None:
                return gid, None
            A = sp.csc_matrix(to_csr(read_mtx(p)))
            A.sum_duplicates()
            ata = _ata_graph(A)
            fl = []
            for k in range(4):
                q = _fill_reducing_q(A, k, None, ata=ata)
                fl.append(ordering_score(A, q)[1])
            return gid, fl

        with ThreadPoolExecutor(max_workers=args.threads) as ex:
            results = list(ex.map(score_one, ext))

        ys, fills = [], []
        missing = 0
        for gid, fl in results:
            if fl is None:
                missing += 1
                continue
            ys.append((gid, int(np.argmin(fl))))
            fills.append((gid, *fl))
        with open(osp.join(out_root, "raw", "graph_y.txt"), "w") as f:
            for gid, y in ys:
                f.write(f"{gid} {y}\n")
        with open(osp.join(out_root, "raw", "fills.txt"), "w") as f:
            for gid, *fl in fills:
                f.write(f"{gid} " + " ".join(str(v) for v in fl) + "\n")
        dist = np.bincount([y for _, y in ys], minlength=4)
        print(f"{root} -> {out_root}: {len(ys)} labeled "
              f"({missing} missing), class dist {dist.tolist()}")


if __name__ == "__main__":
    main()
