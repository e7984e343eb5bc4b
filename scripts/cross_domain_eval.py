#!/usr/bin/env python
"""Cross-domain evaluation: isolate WHERE the 408-set accuracy gap comes from.

The raw SuiteSparse matrices behind the reference's 408-graph training set
(`STMMQR/GCNdata_408.txt`) are not shipped and cannot be downloaded in this
environment; `datasets/classorder.py` regenerates their graph *structure*
synthetically from the published per-graph statistics (`QR_extinfo.txt`),
while the 8 Classtest matrices ship as real `.mtx` files.

This script runs the 2x2 evaluation grid that attributes the gap:

  model                      | synth-408 (val) | real Classtest
  ---------------------------+-----------------+---------------
  reference ep5000 (ported)  |      low        |     high      <- real-trained
  ours (trained on synth)    |      high       |     low       <- synth-trained

Within-domain evaluation succeeds in both directions and cross-domain fails
in both directions, demonstrating that the residual gap vs the reference's
0.779-0.794 val accuracy is the unavailable raw matrices (an input-data
substitution), not the framework. The ported reference weights are verified
per-layer against the torch forward in ``tests/test_reference_parity.py``
(reference `GCN_classifier/testgraph.py:90-124`).

Usage::

    python scripts/cross_domain_eval.py [--platform cpu]
"""
import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import jax


def _pad(g):
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data import pad_graph
    import jax.numpy as jnp

    n, e = int(g.n_node[0]), int(g.n_edge[0])
    nb = 1 << max(4, math.ceil(math.log2(max(n, 1))))
    eb = 1 << max(4, math.ceil(math.log2(max(e, 1))))
    p = pad_graph(g, num_nodes=nb, num_edges=eb, num_graphs=2)
    return jax.tree_util.tree_map(jnp.asarray, p)


def evaluate(model, params, ds):
    import numpy as np

    fwd = jax.jit(lambda p, g: model.apply(p, g))
    correct = total = 0
    for i in range(len(ds)):
        g = ds.get(i)
        out = np.asarray(fwd(params, _pad(g)))[0]
        correct += int(out.argmax()) == int(np.asarray(g.y).reshape(-1)[0])
        total += 1
    return correct, total


def load_ours(ckpt, log_exinfo, template_graph):
    import flax.serialization

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.models.reorder_classifier import (
        ReorderClassifier,
    )

    model = ReorderClassifier(log_exinfo=log_exinfo)
    tmpl = model.init(jax.random.PRNGKey(0), _pad(template_graph))
    with open(ckpt, "rb") as f:
        loaded = flax.serialization.from_bytes({"params": tmpl}, f.read())
    return model, loaded["params"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu", "axon", "none"])
    ap.add_argument("--split-seed", type=int, default=1036)
    args = ap.parse_args()
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from port_reference_weights import port_reference_params

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets import (
        Classorder,
        ClassorderTest,
    )
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.models.reorder_classifier import (
        ReorderClassifier,
    )

    synth_val = Classorder("data/Classorder", 1, split_seed=args.split_seed,
                           matrices_dir="data/matrices")
    real_test = ClassorderTest("data/Classtest", matrices_dir="data/matrices")

    rows = []

    ref_model = ReorderClassifier(readout="max", log_exinfo=False)
    ref_params = port_reference_params()
    c1, t1 = evaluate(ref_model, ref_params, synth_val)
    c2, t2 = evaluate(ref_model, ref_params, real_test)
    rows.append(("reference ep5000 (ported, real-trained)", c1, t1, c2, t2))

    def _first(*paths):
        for p in paths:
            if os.path.exists(p):
                return p
        return paths[-1]

    for name, ckpt, log_ex in [
        ("ours default (synth-trained)",
         _first("models_ckpt/ref408_v3/graphmodel_best.msgpack",
                "models_ckpt/ref408/graphmodel_best.msgpack"), True),
        ("ours strict-parity (synth-trained)",
         _first("models_ckpt/ref408_v3_strict/graphmodel_best.msgpack",
                "models_ckpt/ref408_strict/graphmodel_best.msgpack"), False),
    ]:
        if not os.path.exists(ckpt):
            print(f"skip {name}: {ckpt} missing")
            continue
        model, params = load_ours(ckpt, log_ex, real_test.get(0))
        c1, t1 = evaluate(model, params, synth_val)
        c2, t2 = evaluate(model, params, real_test)
        rows.append((name, c1, t1, c2, t2))

    print(f"\n{'model':<42} {'synth-408 val':>14} {'real Classtest':>15}")
    for name, c1, t1, c2, t2 in rows:
        print(f"{name:<42} {c1}/{t1} = {c1/t1:.3f}   {c2}/{t2} = {c2/t2:.3f}")


if __name__ == "__main__":
    main()
