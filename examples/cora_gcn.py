#!/usr/bin/env python
"""Full-batch 2-layer GCN node classification — reference
``examples/gcn.py`` (Planetoid).  Uses real Planetoid raw files when present
under data/Planetoid/<name>/raw, else a synthetic community graph."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import GCNConv
from examples._common import synthetic_planetoid


class GCN(nn.Module):
    in_dim: int
    hidden: int
    classes: int

    @nn.compact
    def __call__(self, x, senders, receivers, *, train=False):
        x = nn.relu(GCNConv(self.in_dim, self.hidden)(x, senders, receivers))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = GCNConv(self.hidden, self.classes)(x, senders, receivers)
        return jax.nn.log_softmax(x)


def main():
    try:
        from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets import Planetoid
        ds = Planetoid("data/Planetoid/Cora", "cora")
        g, masks = ds.get(0), ds.split_masks
        print("using real Cora")
    except Exception:
        g, masks = synthetic_planetoid()
        print("using synthetic planetoid")
    x = jnp.asarray(g.nodes); y = jnp.asarray(g.y).reshape(-1)
    s, r = jnp.asarray(g.senders), jnp.asarray(g.receivers)
    tm = jnp.asarray(masks["train"]); vm = jnp.asarray(masks["val"])
    model = GCN(x.shape[1], 16, int(y.max()) + 1)
    params = model.init(jax.random.key(0), x, s, r)
    tx = optax.adam(0.01); opt = tx.init(params)

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
        logp = model.apply(params, x, s, r)
        pred = logp.argmax(-1)
        return jnp.sum((pred == y) * mask) / jnp.sum(mask)

    key = jax.random.key(1)
    t0 = time.time()
    for epoch in range(200):
        key, sub = jax.random.split(key)
        params, opt, l = step(params, opt, sub)
        if epoch % 50 == 0:
            print(f"epoch {epoch}: loss={float(l):.4f} val={float(acc(params, vm)):.4f}")
    print(f"test accuracy: {float(acc(params, jnp.asarray(masks['test']))):.4f} "
          f"({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
