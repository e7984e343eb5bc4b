#!/usr/bin/env python
"""The hello-world: GCN on Zachary's karate club — reference
``examples/karate.py`` (and the PyG tutorial): semi-supervised 2-faction
classification from ONE labeled node per faction."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets import KarateClub
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import GCNConv


class GCN(nn.Module):
    @nn.compact
    def __call__(self, x, s, r):
        h = jnp.tanh(GCNConv(x.shape[-1], 8)(x, s, r, num_nodes=x.shape[0]))
        h = jnp.tanh(GCNConv(8, 4)(h, s, r, num_nodes=x.shape[0]))
        return jax.nn.log_softmax(nn.Dense(2)(h))


def main():
    g = KarateClub()[0]
    n = int(np.sum(np.asarray(g.n_node)))
    x = jnp.eye(n, dtype=jnp.float32)  # one-hot ids (featureless graph)
    s, r = jnp.asarray(g.senders), jnp.asarray(g.receivers)
    y = jnp.asarray(g.y)
    train_mask = np.zeros(n, bool)
    train_mask[[0, 33]] = True  # Mr. Hi and the officer
    train_mask = jnp.asarray(train_mask)

    net = GCN()
    params = net.init(jax.random.PRNGKey(0), x, s, r)
    opt = optax.adam(0.01)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            out = net.apply(p, x, s, r)
            ll = -jnp.take_along_axis(out, y[:, None], 1)[:, 0]
            return jnp.sum(ll * train_mask) / train_mask.sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, state = opt.update(grads, state)
        return optax.apply_updates(params, upd), state, loss

    for epoch in range(1, 101):
        params, state, loss = step(params, state)
        if epoch % 25 == 0:
            pred = jnp.argmax(net.apply(params, x, s, r), -1)
            acc = float((pred == y).mean())
            print(f"epoch {epoch:3d}  loss {float(loss):.4f}  "
                  f"all-node accuracy {acc:.3f}")
    pred = jnp.argmax(net.apply(params, x, s, r), -1)
    acc = float((pred == y).mean())
    print(f"2 labels → {acc:.1%} of the 34 members correctly assigned")
    assert acc > 0.9


if __name__ == "__main__":
    main()
