#!/usr/bin/env python
"""Compute per-method symbolic fills for every matrix of a generated corpus.

Writes ``raw/fills.txt`` rows: ``gid f_amd f_colamd f_metis f_nesdis`` —
consumed by ``Classorder`` (appended to ``Graph.globals[:, 10:14]``) to
enable cost-sensitive (fill-regret) training of the reordering classifier.

Usage: python tools/compute_fills.py data/ClassorderGen
"""
import argparse
import glob
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--matrices-dir", default=None)
    args = ap.parse_args()

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu import native
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.io.mtx import read_mtx

    if not native.build_native():
        raise SystemExit("need g++")

    mdir = args.matrices_dir or osp.join(args.root, "matrices")
    ext = np.loadtxt(osp.join(args.root, "raw", "QR_extinfo.txt"))
    index = {}
    for p in sorted(glob.glob(osp.join(mdir, "*.mtx"))):
        t = read_mtx(p)
        index[(t.nrow, len(t.rows))] = (p, t)

    out = open(osp.join(args.root, "raw", "fills.txt"), "w")
    t0 = time.time()
    done = 0
    for row in np.atleast_2d(ext):
        gid = int(row[0])
        key = (int(row[1]), int(row[2]))
        if key not in index:
            continue
        _, t = index[key]
        _, fills = native.label_matrix(
            t.rows.astype(np.int32), t.cols.astype(np.int32), t.nrow, t.ncol
        )
        out.write(f"{gid}\t{fills[0]}\t{fills[1]}\t{fills[2]}\t{fills[3]}\n")
        done += 1
        if done % 200 == 0:
            print(f"[{time.time()-t0:.0f}s] {done}", flush=True)
    out.close()
    print(f"{done} matrices in {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
