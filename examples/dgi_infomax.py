#!/usr/bin/env python
"""Deep Graph Infomax unsupervised embeddings + linear probe — reference
``examples/infomax.py``: maximize MI between node embeddings and the graph
summary against feature-shuffled negatives, then classify with a frozen
linear head."""
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
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.models import (
    DeepGraphInfomax, dgi_loss)
from examples._common import synthetic_planetoid

HIDDEN = 64


class Encoder(nn.Module):
    in_dim: int

    @nn.compact
    def __call__(self, x, senders, receivers):
        h = nn.PReLU()(GCNConv(self.in_dim, HIDDEN)(
            x, senders, receivers, num_nodes=x.shape[0]))
        return h


def main():
    g, masks = synthetic_planetoid()
    x, s, r = jnp.asarray(g.nodes), jnp.asarray(g.senders), jnp.asarray(g.receivers)
    y = np.asarray(g.y)

    enc_holder = {}

    class DGI(nn.Module):
        @nn.compact
        def __call__(self, x, s, r, *, corrupt_key):
            model = DeepGraphInfomax(HIDDEN, Encoder(x.shape[-1]))
            pos_z, neg_z, summary = model(x, s, r, corrupt_key=corrupt_key)
            w = self.param("weight", nn.initializers.uniform(), (HIDDEN, HIDDEN))
            return pos_z, dgi_loss(pos_z, neg_z, summary, w)

    dgi = DGI()
    params = dgi.init(jax.random.PRNGKey(0), x, s, r,
                      corrupt_key=jax.random.PRNGKey(1))
    opt = optax.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state, key):
        def loss_fn(p):
            _, loss = dgi.apply(p, x, s, r, corrupt_key=key)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, state = opt.update(grads, state)
        return optax.apply_updates(params, upd), state, loss

    key = jax.random.PRNGKey(2)
    for epoch in range(1, 151):
        key, k = jax.random.split(key)
        params, state, loss = step(params, state, k)
        if epoch % 50 == 0:
            print(f"epoch {epoch:3d}  DGI loss {float(loss):.4f}")

    z, _ = dgi.apply(params, x, s, r, corrupt_key=jax.random.PRNGKey(3))
    z = np.asarray(z)
    # frozen-embedding linear probe (reference uses sklearn LogisticRegression)
    tr, te = masks["train"], masks["test"]
    W = np.linalg.lstsq(z[tr], np.eye(int(y.max()) + 1)[y[tr]], rcond=None)[0]
    acc = (np.argmax(z[te] @ W, -1) == y[te]).mean()
    print(f"linear-probe test accuracy on frozen DGI embeddings: {acc:.3f}")


if __name__ == "__main__":
    main()
