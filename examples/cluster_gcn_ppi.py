#!/usr/bin/env python
"""Cluster-GCN on multi-label PPI — reference
``examples/cluster_gcn_ppi.py`` (partition minibatches over the PPI
graphs, 6 GraphConv-style layers, BCE over independent labels;
PPI-style synthetic data, micro-F1 reported)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data import (
    ClusterData,
    ClusterLoader,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import SAGEConv
from examples._common import synthetic_planetoid

L = 12


class Net(nn.Module):
    hidden: int = 64
    layers: int = 4

    @nn.compact
    def __call__(self, g, *, train=False):
        h = g.nodes
        for i in range(self.layers):
            h = SAGEConv(h.shape[-1], self.hidden)(
                h, g.senders, g.receivers, num_nodes=h.shape[0])
            if i < self.layers - 1:
                h = nn.relu(h)
                h = nn.Dropout(0.2, deterministic=not train)(h)
        return nn.Dense(L)(h)


def micro_f1(logits, y):
    pred = np.asarray(logits) > 0
    tp = float(np.sum(pred & (y > 0.5)))
    fp = float(np.sum(pred & (y < 0.5)))
    fn = float(np.sum(~pred & (y > 0.5)))
    return 2 * tp / max(2 * tp + fp + fn, 1e-12)


def main():
    g, masks = synthetic_planetoid(n=1200, f=50, classes=6)
    rng = np.random.default_rng(0)
    w = rng.normal(size=(g.nodes.shape[1], L))
    y_all = (np.asarray(g.nodes) @ w
             + 0.3 * rng.normal(size=(1200, L)) > 0).astype(np.float32)
    g = g._replace(y=y_all)  # carried through partitioning

    loader = ClusterLoader(ClusterData(g, num_parts=12), batch_size=3,
                           shuffle=True)
    model = Net()
    padded, _ = next(iter(loader))
    gj = jax.tree_util.tree_map(jnp.asarray, padded)
    params = model.init(jax.random.key(0), gj)
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, g, labels, mask, key):
        def loss(p):
            logits = model.apply(p, g, train=True, rngs={"dropout": key})
            bce = optax.sigmoid_binary_cross_entropy(logits, labels)
            return jnp.sum(bce * mask[:, None]) / jnp.maximum(
                jnp.sum(mask) * L, 1)
        l, grads = jax.value_and_grad(loss)(params)
        u, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), opt, l

    key = jax.random.key(1)
    for epoch in range(1, 31):
        tot, nb = 0.0, 0
        for padded, _ in loader:
            gj = jax.tree_util.tree_map(jnp.asarray, padded)
            mask = gj.node_mask().astype(jnp.float32)
            key, sub = jax.random.split(key)
            params, opt, l = step(params, opt, gj, gj.y, mask, sub)
            tot += float(l); nb += 1
        if epoch % 10 == 0:
            logits = model.apply(
                params, jax.tree_util.tree_map(jnp.asarray, g))
            test = np.asarray(masks["test"])
            print(f"epoch {epoch:3d}  loss {tot / nb:.4f}  "
                  f"test micro-F1 {micro_f1(logits[test], y_all[test]):.4f}")


if __name__ == "__main__":
    main()
