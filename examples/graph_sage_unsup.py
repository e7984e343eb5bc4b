#!/usr/bin/env python
"""Unsupervised GraphSAGE — reference ``examples/graph_sage_unsup.py``:
embeddings trained with the link-level objective
-log sigma(z_u . z_v) - log sigma(-z_u . z_n) (positive = real edges,
negative = random nodes), then evaluated by logistic-probe accuracy."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import SAGEConv
from examples._common import synthetic_planetoid


class Encoder(nn.Module):
    hidden: int = 64
    out: int = 32

    @nn.compact
    def __call__(self, x, senders, receivers):
        n = x.shape[0]
        h = nn.relu(SAGEConv(x.shape[-1], self.hidden)(
            x, senders, receivers, num_nodes=n))
        return SAGEConv(self.hidden, self.out)(h, senders, receivers, num_nodes=n)


def main():
    g, masks = synthetic_planetoid()
    x = jnp.asarray(g.nodes)
    s = jnp.asarray(g.senders)
    r = jnp.asarray(g.receivers)
    y = np.asarray(g.y)
    n = x.shape[0]

    net = Encoder()
    params = net.init(jax.random.PRNGKey(0), x, s, r)
    opt = optax.adam(5e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state, key):
        neg = jax.random.randint(key, (s.shape[0],), 0, n)

        def loss_fn(p):
            z = net.apply(p, x, s, r)
            pos = jnp.sum(z[s] * z[r], -1)
            ngt = jnp.sum(z[s] * z[neg], -1)
            return -(jnp.mean(jax.nn.log_sigmoid(pos))
                     + jnp.mean(jax.nn.log_sigmoid(-ngt)))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, state = opt.update(grads, state)
        return optax.apply_updates(params, upd), state, loss

    key = jax.random.PRNGKey(1)
    for epoch in range(1, 51):
        key, sub = jax.random.split(key)
        params, state, loss = step(params, state, sub)
        if epoch % 10 == 0:
            print(f"epoch {epoch:3d}  unsup loss {float(loss):.4f}")

    # probe: nearest class-centroid on the train split (no gradient leakage)
    z = np.asarray(net.apply(params, x, s, r))
    z = z / np.maximum(np.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
    tr = masks["train"]
    cents = np.stack([z[tr & (y == c)].mean(0) for c in range(y.max() + 1)])
    pred = (z @ cents.T).argmax(-1)
    acc = float((pred[masks["test"]] == y[masks["test"]]).mean())
    print(f"centroid-probe test accuracy: {acc:.4f}")


if __name__ == "__main__":
    main()
