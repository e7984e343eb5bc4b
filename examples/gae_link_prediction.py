#!/usr/bin/env python
"""GAE link prediction — reference ``examples/autoencoder.py``."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import GCNConv
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.models import recon_loss
from examples._common import synthetic_planetoid


class Encoder(nn.Module):
    hidden: int = 32
    out: int = 16

    @nn.compact
    def __call__(self, x, s, r):
        x = nn.relu(GCNConv(x.shape[-1], self.hidden)(x, s, r))
        return GCNConv(self.hidden, self.out)(x, s, r)


def main():
    g, _ = synthetic_planetoid(n=400, f=32)
    rng = np.random.default_rng(0)
    s, r = np.asarray(g.senders), np.asarray(g.receivers)
    e = len(s)
    perm = rng.permutation(e)
    train_e, test_e = perm[: int(0.9 * e)], perm[int(0.9 * e):]
    x = jnp.asarray(g.nodes)
    ts, tr = jnp.asarray(s[train_e]), jnp.asarray(r[train_e])
    n = int(g.n_node[0])

    enc = Encoder()
    params = enc.init(jax.random.key(0), x, ts, tr)
    tx = optax.adam(0.01)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        neg_s = jax.random.randint(key, (len(train_e),), 0, n)
        neg_r = jax.random.randint(jax.random.fold_in(key, 1), (len(train_e),), 0, n)
        def loss(p):
            z = enc.apply(p, x, ts, tr)
            return recon_loss(z, ts, tr, neg_s, neg_r)
        l, grads = jax.value_and_grad(loss)(params)
        u, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), opt, l

    key = jax.random.key(1)
    for epoch in range(100):
        key, sub = jax.random.split(key)
        params, opt, l = step(params, opt, sub)
    # AUC on held-out edges vs random negatives
    z = enc.apply(params, x, ts, tr)
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.models import inner_product_decode
    pos = inner_product_decode(z, jnp.asarray(s[test_e]), jnp.asarray(r[test_e]))
    neg = inner_product_decode(z, jnp.asarray(rng.integers(0, n, len(test_e))),
                               jnp.asarray(rng.integers(0, n, len(test_e))))
    auc = float(np.mean(np.asarray(pos)[:, None] > np.asarray(neg)[None, :]))
    print(f"final loss {float(l):.4f}, held-out AUC ~ {auc:.3f}")


if __name__ == "__main__":
    main()
