#!/usr/bin/env python
"""Downstream evaluation: *factorization cost* of model-selected orderings,
measured against this repo's own multifrontal QR.

This is the paper's actual headline (reference ``README.md:7``: −20.78 %
numeric-factorization-time reduction from GCN-selected orderings vs
always-COLAMD, measured with STM-MQR on a Taishan server) — reproduced
end-to-end with the TPU-native solver: the classifier picks an ordering,
``sparseqr.analyze`` prices it.

Two cost readings:
* full split: Householder **flop count** of the multifrontal QR under each
  ordering (the direct symbolic predictor of factorize time — compile-free,
  so the whole split is affordable);
* ``--measure N``: real steady-state **wall time** per ordering on the
  device for N sampled matrices (chain-differenced to defeat the tunnel
  RTT), reported alongside the flops so the proxy is grounded.

Usage: python scripts/eval_time.py [--measure 8] [--platform cpu]
"""
import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="data/ClassorderGen")
    ap.add_argument("--matrices-dir", default="data/ClassorderGen/matrices")
    ap.add_argument("--split", type=int, default=1, help="0 train 1 val 2 test")
    ap.add_argument("--ckpt", default="models_ckpt/graphmodel_best.msgpack",
                    help="checkpoint path, or comma-separated list for a "
                         "probability-mean seed ensemble")
    ap.add_argument("--readout", default="meanmax", choices=["max", "meanmax"])
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--measure", type=int, default=0,
                    help="also wall-time N matrices × 4 orderings on device")
    ap.add_argument("--platform", default=None, choices=[None, "cpu"])
    args = ap.parse_args()
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import flax.serialization
    import jax.numpy as jnp
    import numpy as np
    import scipy.sparse as sp

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu import sparseqr
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.batch import (
        pad_to_bucket)
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets import (
        Classorder)
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets.classorder import (
        _index_matrices)
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.io.mtx import (
        read_mtx, to_csr)
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.models import (
        ReorderClassifier)

    ds = Classorder(args.data_root, args.split, matrices_dir=args.matrices_dir)
    mtx_index = _index_matrices(args.matrices_dir)

    model = ReorderClassifier(hidden=args.hidden, readout=args.readout)
    g0 = jax.tree_util.tree_map(jnp.asarray, pad_to_bucket(ds.get(0)))
    params0 = model.init(jax.random.key(0), g0)

    def _load(path):
        with open(path, "rb") as f:
            raw = f.read()
        try:
            state = flax.serialization.from_bytes({"params": params0}, raw)
            return state["params"]
        except ValueError:
            state = flax.serialization.from_bytes(
                {"params": params0["params"]}, raw)
            return {"params": state["params"]}

    all_params = [_load(p) for p in args.ckpt.split(",")]
    if len(all_params) > 1:
        print(f"seed ensemble: {len(all_params)} checkpoints")

    @jax.jit
    def fwd(g):
        probs = sum(jnp.exp(model.apply(p, g)) for p in all_params)
        return jnp.log(probs / len(all_params))

    names = ["AMD", "COLAMD", "METIS", "NESDIS"]
    flops = {k: [] for k in range(4)}
    picks, paths = [], []
    for i in range(len(ds)):
        g = ds.get(i)
        ext = np.asarray(g.globals)[0]
        path = mtx_index.get((int(ext[0]), int(ext[1])))
        if path is None:
            continue
        A = sp.csc_matrix(to_csr(read_mtx(path)))
        for k in range(4):
            flops[k].append(sparseqr.analyze(A, k).flops)
        gp = jax.tree_util.tree_map(jnp.asarray, pad_to_bucket(g))
        picks.append(int(np.asarray(fwd(gp))[0].argmax()))
        paths.append(path)

    n = len(picks)
    gm = lambda v: float(np.exp(np.mean(np.log(np.maximum(v, 1e-30)))))
    fl = {k: np.asarray(flops[k]) for k in range(4)}
    fl_model = np.asarray([fl[p][i] for i, p in enumerate(picks)])
    fl_best = np.min(np.stack([fl[k] for k in range(4)]), axis=0)

    print(f"matrices: {n} (split {args.split})")
    print(f"geo-mean QR flops, model-selected vs per-matrix optimum: "
          f"+{100*(gm(fl_model/fl_best)-1):.2f}%")
    for k in range(4):
        print(f"  always-{names[k]:7s}: +{100*(gm(fl[k]/fl_best)-1):.2f}%")
    vs_colamd = 1 - gm(fl_model / fl[1])
    print(f"model vs always-COLAMD: {-100*vs_colamd:+.2f}% flops "
          f"(reference headline: -20.78% TIME vs COLAMD, README.md:7)")

    if args.measure:
        from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.sparseqr.numeric import (
            _make_fused_run, build_plan, ell_values)
        # measure the LARGEST matrices: micro-instances are device-dispatch
        # bound (time tracks level count, not flops) and RTT jitter swamps
        # sub-ms differences
        sel = np.argsort(fl[1])[::-1][:min(args.measure, n)]
        t_model, t_colamd, lf, lt = [], [], [], []

        from benchmark.qr_timing import time_factorize

        def fac_time(A, k):
            sym = sparseqr.analyze(A, k)
            S = A[:, sym.q].tocsc()
            plan = build_plan(sym, S)
            run = _make_fused_run(plan.buckets, False)
            vals = jnp.asarray(ell_values(plan), jnp.float32)
            return time_factorize(run, plan, vals), sym.flops

        print(f"\nwall-time sample ({len(sel)} matrices × 4 orderings):")
        for i in sel:
            A = sp.csc_matrix(to_csr(read_mtx(paths[i])))
            ts = {}
            for k in range(4):
                ts[k], f = fac_time(A, k)
                lf.append(np.log(max(f, 1.0)))
                lt.append(np.log(ts[k]))
            t_model.append(ts[picks[i]])
            t_colamd.append(ts[1])
            print(f"  {osp.basename(paths[i]):<16} "
                  + "  ".join(f"{names[k]}={ts[k]*1e3:7.2f}ms"
                              for k in range(4))
                  + f"  pick={names[picks[i]]}")
        red = 1 - gm(np.asarray(t_model) / np.asarray(t_colamd))
        corr = np.corrcoef(lf, lt)[0, 1]
        print(f"measured time, model vs always-COLAMD: {-100*red:+.2f}%")
        print(f"log-time ~ log-flops correlation: r={corr:.3f} "
              f"(flop proxy validity)")


if __name__ == "__main__":
    main()
