#!/usr/bin/env python
"""Downstream evaluation: fill cost of model-selected orderings.

The paper's headline (reference README.md:7) is a −20.78 % numeric-
factorization-time reduction from GCN-selected orderings vs always-COLAMD.
The hardware-independent analog: the *symbolic fill* (lnz) of the ordering
the classifier picks, relative to (a) the per-matrix optimum and (b) fixed
single-method baselines.  Uses the native labeler to recompute all four
fills per validation matrix.

Usage: python scripts/eval_fill.py [--ckpt models_ckpt/graphmodel_best.msgpack]
"""
import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="data/ClassorderGen")
    ap.add_argument("--matrices-dir", default="data/ClassorderGen/matrices")
    ap.add_argument("--split", type=int, default=1, help="0 train, 1 val, 2 test")
    ap.add_argument("--ckpt", default="models_ckpt/graphmodel_best.msgpack",
                    help="checkpoint path, or comma-separated list for a "
                         "probability-mean seed ensemble")
    ap.add_argument("--readout", default="max", choices=["max", "meanmax"])
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--platform", default=None, choices=[None, "cpu"])
    args = ap.parse_args()
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import flax.serialization
    import jax.numpy as jnp
    import numpy as np

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu import native
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.batch import (
        pad_to_bucket,
    )
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets import Classorder
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.io.features import (
        features_from_mtx,
    )
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets.classorder import (
        _index_matrices,
    )
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.models import (
        ReorderClassifier,
    )

    ds = Classorder(args.data_root, args.split, matrices_dir=args.matrices_dir)
    mtx_index = _index_matrices(args.matrices_dir)

    model = ReorderClassifier(hidden=args.hidden, readout=args.readout)
    g0 = jax.tree_util.tree_map(jnp.asarray, pad_to_bucket(ds.get(0)))
    params0 = model.init(jax.random.key(0), g0)

    def _load(path):
        with open(path, "rb") as f:
            raw = f.read()
        # accept both {"params": <inner>} and {"params": <full vars>}
        try:
            state = flax.serialization.from_bytes({"params": params0}, raw)
            return state["params"]
        except ValueError:
            state = flax.serialization.from_bytes(
                {"params": params0["params"]}, raw)
            return {"params": state["params"]}

    all_params = [_load(p) for p in args.ckpt.split(",")]
    if len(all_params) > 1:
        print(f"seed ensemble: {len(all_params)} checkpoints "
              "(mean of class probabilities)")

    @jax.jit
    def fwd(g):
        # probability-mean ensemble (a single ckpt reduces to its own probs)
        probs = sum(jnp.exp(model.apply(p, g)) for p in all_params)
        return jnp.log(probs / len(all_params))

    names = ["AMD", "COLAMD", "METIS", "NESDIS"]
    regret_model, regret_fixed = [], {k: [] for k in range(4)}
    correct = top2 = total = 0
    for i in range(len(ds)):
        g = ds.get(i)
        ext = np.asarray(g.globals)[0]
        key = (int(ext[0]), int(ext[1]))
        path = mtx_index.get(key)
        if path is None:
            continue
        gf = features_from_mtx(path)
        _, fills = native.label_matrix(
            gf.rows.astype(np.int32), gf.cols.astype(np.int32), gf.nrow, gf.ncol
        )
        gp = jax.tree_util.tree_map(jnp.asarray, pad_to_bucket(g))
        logp = np.asarray(fwd(gp))[0]
        pred = int(logp.argmax())
        y = int(np.asarray(g.y).ravel()[0])
        best = min(fills.values())
        correct += int(pred == y)
        top2 += int(y in logp.argsort()[-2:])
        total += 1
        regret_model.append(fills[pred] / best)
        for k in range(4):
            regret_fixed[k].append(fills[k] / best)

    gm = lambda v: float(np.exp(np.mean(np.log(v))))
    print(f"graphs evaluated: {total}")
    print(f"accuracy: {correct/total:.4f}   top-2: {top2/total:.4f}")
    print(f"geo-mean fill regret, model-selected: {gm(regret_model):.4f} "
          f"(+{100*(gm(regret_model)-1):.2f}% fill vs per-matrix optimum)")
    for k in range(4):
        print(f"  always-{names[k]:7s}: {gm(regret_fixed[k]):.4f} "
              f"(+{100*(gm(regret_fixed[k])-1):.2f}%)")
    worst_fixed = min(gm(regret_fixed[k]) for k in range(4))
    print(f"model vs best fixed policy: "
          f"{100*(1 - gm(regret_model)/worst_fixed):+.2f}% fill")


if __name__ == "__main__":
    main()
