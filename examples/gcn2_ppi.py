#!/usr/bin/env python
"""GCNII on multi-label PPI — reference ``examples/gcn2_ppi.py``
(9 GCN2Conv layers, alpha=0.5, theta=1.0, BCE over 121-role labels;
PPI-style synthetic multigraph data, micro-F1 reported)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import GCN2Conv
from examples._common import synthetic_planetoid

L = 12   # independent labels (reference PPI has 121)
DEPTH = 9


class Net(nn.Module):
    hidden: int = 64

    @nn.compact
    def __call__(self, x, senders, receivers, *, train=False):
        n = x.shape[0]
        x0 = nn.relu(nn.Dense(self.hidden)(x))
        h = x0
        for layer in range(1, DEPTH + 1):
            h = nn.Dropout(0.2, deterministic=not train)(h)
            h = nn.relu(GCN2Conv(self.hidden, alpha=0.5, theta=1.0,
                                 layer=layer, shared_weights=False)(
                h, x0, senders, receivers, num_nodes=n))
        h = nn.Dropout(0.2, deterministic=not train)(h)
        return nn.Dense(L)(h)


def micro_f1(logits, y):
    pred = np.asarray(logits) > 0
    tp = float(np.sum(pred & (y > 0.5)))
    fp = float(np.sum(pred & (y < 0.5)))
    fn = float(np.sum(~pred & (y > 0.5)))
    return 2 * tp / max(2 * tp + fp + fn, 1e-12)


def main():
    g, masks = synthetic_planetoid(n=600, f=50, classes=6)
    rng = np.random.default_rng(0)
    w = rng.normal(size=(g.nodes.shape[1], L))
    y = (np.asarray(g.nodes) @ w
         + 0.3 * rng.normal(size=(600, L)) > 0).astype(np.float32)

    x = jnp.asarray(g.nodes)
    s, r = jnp.asarray(g.senders), jnp.asarray(g.receivers)
    yj = jnp.asarray(y)
    tm = jnp.asarray(masks["train"])[:, None]
    model = Net()
    params = model.init(jax.random.key(0), x, s, r)
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        def loss(p):
            logits = model.apply(p, x, s, r, train=True,
                                 rngs={"dropout": key})
            bce = optax.sigmoid_binary_cross_entropy(logits, yj)
            return jnp.sum(bce * tm) / jnp.maximum(jnp.sum(tm) * L, 1)
        l, grads = jax.value_and_grad(loss)(params)
        u, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), opt, l

    key = jax.random.key(1)
    test = np.asarray(masks["test"])
    for epoch in range(1, 61):
        key, sub = jax.random.split(key)
        params, opt, l = step(params, opt, sub)
        if epoch % 15 == 0:
            logits = model.apply(params, x, s, r)
            print(f"epoch {epoch:3d}  loss {float(l):.4f}  "
                  f"test micro-F1 {micro_f1(logits[test], y[test]):.4f}")


if __name__ == "__main__":
    main()
