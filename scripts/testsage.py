#!/usr/bin/env python
"""Evaluate the node-scoring reorder net and write predicted orderings —
reference ``GCN_classifier/testsage.py`` (``saveall`` writes
``resultdata/<name>.mtx`` permutation files consumed by qrtest's GIVEN
ordering path, ``STMMQR/test/qrtest.c:155-169``).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="data/Reorder")
    ap.add_argument("--matrices-dir", default="data/matrices")
    ap.add_argument("--ckpt", default="models_ckpt/sage_order.msgpack")
    ap.add_argument("--outdir", default="resultdata")
    ap.add_argument("--platform", default=None, choices=[None, "cpu"])
    args = ap.parse_args()
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import flax.serialization
    import jax.numpy as jnp
    import numpy as np

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.batch import (
        pad_to_bucket,
    )
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets.reorder import Reorder
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.models.sage_order import (
        SageOrderNet,
        order_position_accuracy,
        predicted_ordering,
    )

    test_ds = Reorder(args.data_root, 2, matrices_dir=args.matrices_dir)
    names = test_ds.graph_names(2)
    model = SageOrderNet()

    g0 = pad_to_bucket(test_ds.get(0))
    g0 = jax.tree_util.tree_map(jnp.asarray, g0)
    params = model.init(jax.random.key(0), g0)
    if os.path.exists(args.ckpt):
        with open(args.ckpt, "rb") as f:
            params = flax.serialization.from_bytes(params, f.read())
            if "params" in params:
                params = {"params": params["params"]}
    else:
        print(f"warning: checkpoint {args.ckpt} missing, using random init")

    fwd = jax.jit(lambda p, g: model.apply(p, g))
    os.makedirs(args.outdir, exist_ok=True)
    total_acc = 0.0
    for i in range(len(test_ds)):
        g = pad_to_bucket(test_ds.get(i))
        gj = jax.tree_util.tree_map(jnp.asarray, g)
        t0 = time.time()
        scores = fwd(params, gj)
        n = int(g.n_node[0])
        acc = order_position_accuracy(scores, gj)
        total_acc += acc
        perm = predicted_ordering(scores, n)
        np.savetxt(
            os.path.join(args.outdir, f"{names[i]}.mtx"), perm,
            fmt="%d", delimiter="\t", newline="\n",
        )
        print(f"{names[i]}: n={n} rank-match={acc:.4f} [{time.time()-t0:.3f}s]")
    print(f"mean rank-match accuracy: {total_acc / max(len(test_ds), 1):.4f}")


if __name__ == "__main__":
    main()
