#!/usr/bin/env python
"""Full-batch 2-layer GAT node classification — reference ``examples/gat.py``
(8-head hidden layer, 1-head output, dropout 0.6)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import GATConv
from examples._common import synthetic_planetoid


class GAT(nn.Module):
    in_dim: int
    hidden: int
    classes: int

    @nn.compact
    def __call__(self, x, senders, receivers, *, train=False):
        x = nn.Dropout(0.6, deterministic=not train)(x)
        x = nn.elu(
            GATConv(self.in_dim, self.hidden, heads=8, dropout=0.6)(
                x, senders, receivers, train=train
            )
        )
        x = nn.Dropout(0.6, deterministic=not train)(x)
        x = GATConv(8 * self.hidden, self.classes, heads=1, dropout=0.6)(
            x, senders, receivers, train=train
        )
        return jax.nn.log_softmax(x)


def main():
    g, masks = synthetic_planetoid()
    x = jnp.asarray(g.nodes); y = jnp.asarray(g.y).reshape(-1)
    s, r = jnp.asarray(g.senders), jnp.asarray(g.receivers)
    tm = jnp.asarray(masks["train"]); vm = jnp.asarray(masks["val"])
    model = GAT(x.shape[1], 8, int(y.max()) + 1)
    params = model.init(jax.random.key(0), x, s, r)
    tx = optax.adam(0.005); opt = tx.init(params)

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
    def acc(params, mask):
        pred = model.apply(params, x, s, r).argmax(-1)
        return jnp.sum((pred == y) * mask) / jnp.sum(mask)

    key = jax.random.key(1)
    t0 = time.time()
    for epoch in range(150):
        key, sub = jax.random.split(key)
        params, opt, l = step(params, opt, sub)
        if epoch % 50 == 0:
            print(f"epoch {epoch}: loss={float(l):.4f} val={float(acc(params, vm)):.4f}")
    print(f"test accuracy: {float(acc(params, jnp.asarray(masks['test']))):.4f} "
          f"({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
