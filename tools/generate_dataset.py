#!/usr/bin/env python
"""Generate a Classorder-style training corpus end-to-end with the
framework's own tooling — the full reference data pipeline
(SURVEY.md §3.4: matrices → ``-Dwrite_graph`` features → brute-force labels)
reproduced in-repo:

1. synthesize diverse sparse matrices (grids, bands, random, power-law,
   block, kronecker — the structural families of the UF collection),
2. compute the GCN node/edge/extinfo features with ``io.features``
   (formulas bit-matched to ``SparseCore_read_write.c:1040-1190``),
3. label each matrix with the native brute-force ordering labeler
   (min-lnz among AMD/COLAMD/METIS-ND/NESDIS roles).

Outputs a ready dataset root:  <out>/raw/{QR_extinfo.txt,graph_y.txt}
plus <out>/matrices/*.mtx so ``Classorder(root, matrices_dir=...)`` finds
real structure for every graph id.

Usage: python tools/generate_dataset.py --out data/ClassorderGen --count 408
"""
import argparse
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import scipy.sparse as sp


def _grid2d(rng, n_side, holes=0.0):
    ii, jj = np.meshgrid(np.arange(n_side), np.arange(n_side), indexing="ij")
    nid = ii * n_side + jj
    s = np.concatenate([nid[:-1, :].ravel(), nid[:, :-1].ravel()])
    d = np.concatenate([nid[1:, :].ravel(), nid[:, 1:].ravel()])
    if holes > 0:
        keep = rng.random(len(s)) > holes
        s, d = s[keep], d[keep]
    n = n_side * n_side
    return n, s, d


def _banded(rng, n, bw, density=0.6):
    rows = np.repeat(np.arange(n), bw)
    offs = rng.integers(1, bw + 1, size=len(rows))
    cols = rows - offs
    keep = (cols >= 0) & (rng.random(len(rows)) < density)
    return n, rows[keep], cols[keep]


def _random_uniform(rng, n, avg_deg):
    e = n * avg_deg
    return n, rng.integers(0, n, e), rng.integers(0, n, e)


def _powerlaw(rng, n, avg_deg):
    # preferential-attachment-flavoured: hub-weighted endpoints
    w = (1.0 / (np.arange(n) + 1.0)) ** 0.8
    p = w / w.sum()
    e = n * avg_deg
    return n, rng.choice(n, e, p=p), rng.integers(0, n, e)


def _block_diag(rng, blocks, bsize, coupling):
    s_list, d_list = [], []
    n = blocks * bsize
    for b in range(blocks):
        base = b * bsize
        e = bsize * 4
        s_list.append(base + rng.integers(0, bsize, e))
        d_list.append(base + rng.integers(0, bsize, e))
    ec = int(n * coupling)
    s_list.append(rng.integers(0, n, ec))
    d_list.append(rng.integers(0, n, ec))
    return n, np.concatenate(s_list), np.concatenate(d_list)


def _kron(rng, base_n, levels):
    a = (rng.random((base_n, base_n)) < 0.4).astype(np.float64)
    m = sp.coo_matrix(a)
    for _ in range(levels - 1):
        m = sp.kron(m, sp.coo_matrix(a)).tocoo()
    return m.shape[0], m.row, m.col


def _grid3d(rng, ns):
    idx = np.arange(ns**3).reshape(ns, ns, ns)
    s_list, d_list = [], []
    for ax in range(3):
        sl = [slice(None)] * 3
        sl[ax] = slice(None, -1)
        sr = [slice(None)] * 3
        sr[ax] = slice(1, None)
        s_list.append(idx[tuple(sl)].ravel())
        d_list.append(idx[tuple(sr)].ravel())
    return ns**3, np.concatenate(s_list), np.concatenate(d_list)


def _spd_pattern(n, s, d):
    """Symmetrize + diagonal — the FEM/SPD structural family where nested
    dissection wins (the reference corpus's METIS/NESDIS-labelled mass)."""
    s2 = np.concatenate([s, d, np.arange(n)])
    d2 = np.concatenate([d, s, np.arange(n)])
    return n, s2, d2


def generate(rng, gid):
    fam = gid % 8
    if fam in (0, 1):  # 2D FEM-style meshes (sym+diag): ND territory
        n, s, d = _grid2d(rng, int(rng.integers(16, 64)), holes=float(rng.random() * 0.25))
        n, s, d = _spd_pattern(n, s, d)
    elif fam == 2:  # 3D meshes: deep-ND (NESDIS) territory
        n, s, d = _grid3d(rng, int(rng.integers(6, 14)))
        n, s, d = _spd_pattern(n, s, d)
    elif fam == 3:
        n, s, d = _banded(rng, int(rng.integers(300, 2500)), int(rng.integers(3, 30)))
    elif fam == 4:
        n, s, d = _random_uniform(rng, int(rng.integers(200, 1500)), int(rng.integers(3, 12)))
    elif fam == 5:
        n, s, d = _powerlaw(rng, int(rng.integers(300, 2000)), int(rng.integers(3, 10)))
    elif fam == 6:
        n, s, d = _block_diag(
            rng, int(rng.integers(4, 16)), int(rng.integers(40, 160)),
            float(rng.random() * 0.1),
        )
        if rng.random() < 0.5:
            n, s, d = _spd_pattern(n, s, d)
    else:
        n, s, d = _kron(rng, int(rng.integers(3, 5)), 4)
    # dedup; keep any explicit diagonal (it shapes the AᵀA row cliques and
    # hence the labels — the SPD families need it for ND to matter)
    key = np.unique(s.astype(np.int64) * n + d)
    s = (key // n).astype(np.int32)
    d = (key % n).astype(np.int32)
    return n, s, d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/ClassorderGen")
    ap.add_argument("--count", type=int, default=408)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--write-mtx", action="store_true", default=True)
    args = ap.parse_args()

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu import native
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.io.features import (
        compute_features,
    )
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.io.mtx import Triplets

    if not native.build_native():
        raise SystemExit("need g++ to build native labeler")

    raw = osp.join(args.out, "raw")
    mdir = osp.join(args.out, "matrices")
    os.makedirs(raw, exist_ok=True)
    os.makedirs(mdir, exist_ok=True)

    rng = np.random.default_rng(args.seed)
    fext = open(osp.join(raw, "QR_extinfo.txt"), "w")
    fy = open(osp.join(raw, "graph_y.txt"), "w")
    t00 = time.time()
    counts = np.zeros(4, np.int64)
    for gid in range(args.count):
        t0 = time.time()
        n, s, d = generate(rng, gid)
        t = Triplets(
            rows=s.astype(np.int64), cols=d.astype(np.int64),
            vals=np.ones(len(s)), nrow=n, ncol=n, symmetric=False,
        )
        gf = compute_features(t)
        best, fills = native.label_matrix(s, d, n, n)
        counts[best] += 1
        ext = "\t".join(
            f"{v:.6g}" if isinstance(v, float) else str(v) for v in gf.extinfo
        )
        fext.write(f"{gid}\t{ext}\n")
        fy.write(f"{gid}\t{best}\n")
        if args.write_mtx:
            with open(osp.join(mdir, f"gen_{gid:04d}.mtx"), "w") as f:
                f.write("%%MatrixMarket matrix coordinate real general\n")
                f.write(f"{n} {n} {len(s)}\n")
                for a, b in zip(s, d):
                    f.write(f"{a+1} {b+1} 1.0\n")
        if gid % 20 == 0 or gid == args.count - 1:
            print(
                f"[{time.time()-t00:6.0f}s] {gid+1}/{args.count} n={n} "
                f"nnz={len(s)} label={best} ({time.time()-t0:.1f}s) "
                f"dist={counts.tolist()}",
                flush=True,
            )
    fext.close()
    fy.close()
    print("label distribution:", counts.tolist())


if __name__ == "__main__":
    main()
