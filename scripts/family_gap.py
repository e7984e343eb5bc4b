#!/usr/bin/env python
"""Per-family attribution of the reference-on-synth accuracy ceiling.

The ported real-trained reference model scores 0.647 on the synthesized
408-set val split vs 0.75-0.79 on real matrices; the gap is the synthetic
generator's structure fidelity (``datasets/synth_structure.py``).  This
script joins each val graph with its SuiteSparse name (``GCNdata_408.txt``)
and the generator family that synthesized it, and prints the reference
model's per-family error rate + prediction confusion.

Round-5 note: three stats-dispatched v4 structure variants were evaluated
against this ceiling — a 2-D stencil ``grid`` family for the low-skew
symmetric members (cavity/rdb/cdde), a preferential-attachment family for
the smooth-heavy-tail members (p2p-Gnutella/California/polblogs), and
spatially-ordered numbering for the geometric family (matching the
as-given-ordering locality the ``Eli_add`` feature sees on real meshes).
All three REDUCED the ported model's synth accuracy (44/68 -> 42/68,
42/68, and 41/68 respectively; e.g. the stencil members moved from
correct NESDIS predictions to METIS — a near-tie pair downstream), so the
v3 dispatch is retained.  The residual ceiling is dominated by 2-vs-3
(METIS/NESDIS) and 0-vs-1 (AMD/COLAMD) confusions whose downstream fill
is nearly equal — consistent with the near-tie label structure the
flagship's fill-regret metric already accounts for.

Usage: python scripts/family_gap.py [--split-seed 1036]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import jax


def family_of(stats):
    """Mirror of synthesize_triplets' dispatch (synth_structure.py)."""
    n, nnz, _d, _avg, _fo, _fi, mo, _no, mi, _ni = stats[:10]
    offdiag = max(int(nnz) - int(n), 0)
    if offdiag == 0:
        return "diagonal"
    mean_deg = max(offdiag / n, 0.1)
    skew = max(mo, mi) / max(mean_deg, 0.5)
    symmetric = stats[6] == stats[8] and stats[7] == stats[9]
    if n < 120:
        return "random-digraph"
    if skew > 24.0:
        return "circuit"
    if not symmetric and mean_deg < 4.5:
        return "banded"
    return "geometric"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--split-seed", type=int, default=1036)
    ap.add_argument("--names", default="data/GCNdata_408.txt")
    args = ap.parse_args()
    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from port_reference_weights import port_reference_params

    from scripts.cross_domain_eval import _pad
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets import (
        Classorder,
    )
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.models.reorder_classifier import (
        ReorderClassifier,
    )

    names = {}
    with open(args.names) as f:
        for i, line in enumerate(f):
            parts = line.split()
            if len(parts) >= 2:
                names[int(parts[1])] = os.path.basename(
                    parts[0]).replace(".mtx", "")

    ext = np.loadtxt("data/Classorder/raw/QR_extinfo.txt")
    gid_by_row = ext[:, 0].astype(int)
    rng = np.random.default_rng(args.split_seed)
    order = rng.permutation(len(ext))
    n = len(ext)
    val_rows = order[int(n * 2 / 3):int(n * 5 / 6)]

    ds = Classorder("data/Classorder", 1, split_seed=args.split_seed,
                    matrices_dir="data/matrices")
    assert len(ds) == len(val_rows)

    model = ReorderClassifier(readout="max", log_exinfo=False)
    params = port_reference_params()
    fwd = jax.jit(lambda p, g: model.apply(p, g))

    from collections import defaultdict
    fam_stats = defaultdict(lambda: [0, 0])
    rows = []
    for i in range(len(ds)):
        g = ds.get(i)
        out = np.asarray(fwd(params, _pad(g)))[0]
        pred = int(out.argmax())
        y = int(np.asarray(g.y).reshape(-1)[0])
        row = ext[val_rows[i]]
        gid = int(gid_by_row[val_rows[i]])
        fam = family_of(row[1:])
        ok = pred == y
        fam_stats[fam][0] += ok
        fam_stats[fam][1] += 1
        rows.append((names.get(gid, f"gid{gid}"), fam, y, pred, ok))

    print(f"{'matrix':<22}{'family':<16}{'label':>6}{'pred':>6}{'ok':>4}")
    for nm, fam, y, p, ok in sorted(rows, key=lambda r: (r[1], r[4])):
        print(f"{nm:<22}{fam:<16}{y:>6}{p:>6}{'+' if ok else 'X':>4}")
    print("\nper-family accuracy (reference model on synth val):")
    for fam, (c, t) in sorted(fam_stats.items()):
        print(f"  {fam:<16} {c}/{t} = {c/t:.3f}")


if __name__ == "__main__":
    main()
