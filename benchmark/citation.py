#!/usr/bin/env python
"""Citation-network benchmark harness — reference ``benchmark/citation/``
(train_eval.py:44 run loop with val-loss early stopping).

Runs {GCN, GAT, Cheb, SGC, APPNP, ARMA} on Planetoid data (real raw files if
present, else the synthetic community graph) and prints a timing/accuracy
table like the reference README's.

Usage: python benchmark/citation.py [--cpu] [--runs 3] [--epochs 200]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def build_models(in_dim, classes):
    import flax.linen as nn

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import (
        APPNP,
        ARMAConv,
        ChebConv,
        GATConv,
        GCNConv,
        SGConv,
    )

    class GCN(nn.Module):
        @nn.compact
        def __call__(self, x, s, r, *, train=False):
            x = nn.relu(GCNConv(in_dim, 16)(x, s, r))
            x = nn.Dropout(0.5, deterministic=not train)(x)
            return jax.nn.log_softmax(GCNConv(16, classes)(x, s, r))

    class GAT(nn.Module):
        @nn.compact
        def __call__(self, x, s, r, *, train=False):
            x = nn.elu(GATConv(in_dim, 8, heads=8, dropout=0.6)(x, s, r, train=train))
            x = nn.Dropout(0.6, deterministic=not train)(x)
            return jax.nn.log_softmax(
                GATConv(64, classes, heads=1, concat=False)(x, s, r, train=train)
            )

    class Cheb(nn.Module):
        @nn.compact
        def __call__(self, x, s, r, *, train=False):
            x = nn.relu(ChebConv(in_dim, 16, K=3)(x, s, r))
            x = nn.Dropout(0.5, deterministic=not train)(x)
            return jax.nn.log_softmax(ChebConv(16, classes, K=3)(x, s, r))

    class SGC(nn.Module):
        @nn.compact
        def __call__(self, x, s, r, *, train=False):
            return jax.nn.log_softmax(SGConv(in_dim, classes, K=2)(x, s, r))

    class APPNPNet(nn.Module):
        @nn.compact
        def __call__(self, x, s, r, *, train=False):
            x = nn.Dropout(0.5, deterministic=not train)(x)
            x = nn.relu(nn.Dense(64)(x))
            x = nn.Dropout(0.5, deterministic=not train)(x)
            x = nn.Dense(classes)(x)
            return jax.nn.log_softmax(APPNP(K=10, alpha=0.1)(x, s, r, train=train))

    class ARMA(nn.Module):
        @nn.compact
        def __call__(self, x, s, r, *, train=False):
            x = nn.relu(ARMAConv(in_dim, 16, num_stacks=2, num_layers=1)(x, s, r, train=train))
            x = nn.Dropout(0.5, deterministic=not train)(x)
            return jax.nn.log_softmax(
                ARMAConv(16, classes, num_stacks=2, num_layers=1)(x, s, r, train=train)
            )

    return {
        "GCN": GCN(), "GAT": GAT(), "Cheb": Cheb(), "SGC": SGC(),
        "APPNP": APPNPNet(), "ARMA": ARMA(),
    }


def run_one(model, x, s, r, y, masks, epochs, lr, seed, patience=10):
    import jax.numpy as jnp
    import optax

    tm, vm, testm = (jnp.asarray(masks[k]) for k in ("train", "val", "test"))
    params = model.init(jax.random.key(seed), x, s, r)
    tx = optax.adamw(lr, weight_decay=5e-4)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        def loss(p):
            logp = model.apply(p, x, s, r, train=True, rngs={"dropout": key})
            nll = -jnp.take_along_axis(logp, y[:, None], 1)[:, 0]
            return jnp.sum(nll * tm) / jnp.sum(tm)
        l, grads = jax.value_and_grad(loss)(params)
        u, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), opt, l

    @jax.jit
    def metrics(params):
        logp = model.apply(params, x, s, r)
        nll = -jnp.take_along_axis(logp, y[:, None], 1)[:, 0]
        val_loss = jnp.sum(nll * vm) / jnp.sum(vm)
        pred = logp.argmax(-1)
        test_acc = jnp.sum((pred == y) * testm) / jnp.sum(testm)
        return val_loss, test_acc

    key = jax.random.key(seed + 1)
    best_val, best_test, bad = float("inf"), 0.0, 0
    t0 = time.time()
    n_ep = 0
    for epoch in range(epochs):
        key, sub = jax.random.split(key)
        params, opt, _ = step(params, opt, sub)
        vl, ta = metrics(params)
        n_ep += 1
        if float(vl) < best_val:
            best_val, best_test, bad = float(vl), float(ta), 0
        else:
            bad += 1
            if bad >= patience:  # reference's early stopping (train_eval.py:70)
                break
    return best_test, (time.time() - t0) / max(n_ep, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--lr", type=float, default=0.01)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets import Planetoid

        # real-Cora route engages when EITHER the processed cache or the
        # raw files exist (the dataset loads from processed/ without ever
        # touching raw/; its download() raises immediately with no socket)
        root = "data/Planetoid/Cora"
        have_processed = os.path.isdir(osp := os.path.join(
            root, "processed")) and any(os.scandir(osp))
        have_raw = os.path.isdir(rp := os.path.join(root, "raw")) and any(
            os.scandir(rp))
        if not (have_processed or have_raw):
            raise FileNotFoundError(f"{root}: no processed cache or raw files")
        ds = Planetoid(root, "cora")
        g, masks = ds.get(0), ds.split_masks
        src = "Cora"
    except Exception:
        from examples._common import synthetic_cora

        g, masks = synthetic_cora()
        src = "synthetic-cora (protocol-faithful shape/split, no egress)"

    x = jnp.asarray(g.nodes)
    y = jnp.asarray(g.y).reshape(-1)
    s, r = jnp.asarray(g.senders), jnp.asarray(g.receivers)
    classes = int(y.max()) + 1
    print(f"dataset: {src}  N={x.shape[0]} E={s.shape[0]} F={x.shape[1]} C={classes}")
    print(f"{'model':8s} {'test_acc':>10s} {'ms/epoch':>10s}")
    for name, model in build_models(x.shape[1], classes).items():
        accs, times = [], []
        for run in range(args.runs):
            a, t = run_one(model, x, s, r, y, masks, args.epochs, args.lr, run)
            accs.append(a)
            times.append(t)
        print(
            f"{name:8s} {np.mean(accs):7.4f}±{np.std(accs):.3f} "
            f"{np.mean(times)*1e3:9.1f}"
        )


if __name__ == "__main__":
    main()
