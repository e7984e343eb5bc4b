#!/usr/bin/env python
"""Graph-classification benchmark with 10-fold CV — reference
``benchmark/kernel/`` (TU datasets, GIN/GraphSAGE/TopK models).

Uses a real TUDataset when raw files are present under data/TU/<name>/raw,
else a synthetic 2-class structural corpus (cycle-vs-tree-ish families).

Usage: python benchmark/kernel.py [--cpu] [--folds 10] [--epochs 50]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def synthetic_tu(count=120, seed=0):
    import numpy as np

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.graph import (
        from_edge_index,
    )

    rng = np.random.default_rng(seed)
    graphs = []
    for i in range(count):
        n = int(rng.integers(8, 24))
        label = i % 2
        if label == 0:  # cycle
            s = np.arange(n)
            r = (s + 1) % n
        else:  # star (hub structure — cleanly separable from cycles)
            s = np.arange(1, n)
            r = np.zeros(n - 1, np.int64)
        s2 = np.concatenate([s, r]).astype(np.int32)
        r2 = np.concatenate([r, s]).astype(np.int32)
        x = np.ones((n, 4), np.float32)
        graphs.append(
            from_edge_index(x, np.stack([s2, r2]), y=np.asarray([label], np.int32))
        )
    return graphs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dataset", default="MUTAG")
    ap.add_argument("--folds", type=int, default=10)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--hidden", type=int, default=32)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import flax.linen as nn
    import jax.numpy as jnp
    import numpy as np
    import optax

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.batch import (
        batch_graphs,
        pad_graph,
    )
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import (
        GINConv,
        global_add_pool,
    )

    try:
        from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets import TUDataset

        ds = TUDataset(f"data/TU/{args.dataset}", args.dataset)
        graphs = [ds.get(i) for i in range(len(ds))]
        src = args.dataset
    except Exception:
        graphs = synthetic_tu()
        src = "synthetic"

    classes = int(max(int(np.asarray(g.y)[0]) for g in graphs)) + 1
    f_in = graphs[0].nodes.shape[1]

    class GIN(nn.Module):
        @nn.compact
        def __call__(self, g):
            x = g.nodes

            class MLP(nn.Module):
                @nn.compact
                def __call__(self, h):
                    return nn.Dense(args.hidden)(nn.relu(nn.Dense(args.hidden)(h)))

            x = nn.relu(GINConv(mlp=MLP())(x, g))
            x = nn.relu(GINConv(mlp=MLP())(x, g))
            h = global_add_pool(x, g)
            return jax.nn.log_softmax(nn.Dense(classes)(h))

    # one shared padded shape for all folds
    n_pad = max(int(np.sum(g.n_node)) for g in graphs) + 1
    e_pad = max(int(np.sum(g.n_edge)) for g in graphs)
    batch = 16
    n_pad, e_pad = batch * n_pad, batch * e_pad

    def make_batches(idx, rng):
        rng.shuffle(idx)
        out = []
        for i in range(0, len(idx), batch):
            part = [graphs[j] for j in idx[i : i + batch]]
            out.append(
                pad_graph(
                    batch_graphs(part), num_nodes=n_pad, num_edges=e_pad,
                    num_graphs=batch + 1,
                )
            )
        return out

    model = GIN()
    tx = optax.adam(5e-3)

    @jax.jit
    def step(params, opt, g):
        def loss(p):
            logp = model.apply(p, g)
            y = g.y.reshape(-1).astype(jnp.int32)
            mask = (g.n_node > 0).astype(jnp.float32)
            nll = -jnp.take_along_axis(logp, jnp.clip(y, 0)[:, None], 1)[:, 0]
            return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)

        l, grads = jax.value_and_grad(loss)(params)
        u, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), opt, l

    @jax.jit
    def correct(params, g):
        logp = model.apply(params, g)
        pred = logp.argmax(-1)
        y = g.y.reshape(-1).astype(jnp.int32)
        mask = g.n_node > 0
        return jnp.sum((pred == y) & mask), jnp.sum(mask)

    rng = np.random.default_rng(0)
    order = rng.permutation(len(graphs))
    folds = np.array_split(order, args.folds)
    accs = []
    t0 = time.time()
    for k in range(args.folds):
        test_idx = folds[k]
        train_idx = np.concatenate([folds[j] for j in range(args.folds) if j != k])
        example = make_batches(train_idx.copy(), rng)[0]
        params = model.init(jax.random.key(k), jax.tree_util.tree_map(jnp.asarray, example))
        opt = tx.init(params)
        for ep in range(args.epochs):
            for b in make_batches(train_idx.copy(), rng):
                params, opt, _ = step(params, opt, jax.tree_util.tree_map(jnp.asarray, b))
        c = t = 0
        for b in make_batches(test_idx.copy(), rng):
            ci, ti = correct(params, jax.tree_util.tree_map(jnp.asarray, b))
            c += int(ci)
            t += int(ti)
        accs.append(c / max(t, 1))
    print(
        f"{src}: {args.folds}-fold acc {np.mean(accs):.4f} ± {np.std(accs):.4f} "
        f"[{time.time()-t0:.0f}s]"
    )


if __name__ == "__main__":
    main()
