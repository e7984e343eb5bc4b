#!/usr/bin/env python
"""APPNP (predict-then-propagate) node classification — reference
``examples/ppnp.py`` / ``benchmark/citation/appnp.py``: an MLP on features
whose logits are smoothed by K steps of personalized PageRank."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import APPNP
from examples._common import synthetic_planetoid


class Net(nn.Module):
    hidden: int = 64
    classes: int = 7

    @nn.compact
    def __call__(self, x, senders, receivers, *, train=False):
        h = nn.relu(nn.Dense(self.hidden)(x))
        h = nn.Dropout(0.5, deterministic=not train)(h)
        h = nn.Dense(self.classes)(h)
        h = APPNP(K=10, alpha=0.1)(h, senders, receivers,
                                   num_nodes=x.shape[0])
        return jax.nn.log_softmax(h)


def main():
    g, masks = synthetic_planetoid()
    x, s, r = jnp.asarray(g.nodes), jnp.asarray(g.senders), jnp.asarray(g.receivers)
    y = jnp.asarray(g.y)
    net = Net()
    params = net.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)}, x, s, r)
    opt = optax.adamw(0.01, weight_decay=5e-4)
    state = opt.init(params)

    @jax.jit
    def step(params, state, key):
        def loss_fn(p):
            out = net.apply(p, x, s, r, train=True, rngs={"dropout": key})
            ll = -jnp.take_along_axis(out, y[:, None], 1)[:, 0]
            return jnp.sum(ll * masks["train"]) / masks["train"].sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, state = opt.update(grads, state, params)
        return optax.apply_updates(params, upd), state, loss

    @jax.jit
    def accuracy(params, mask):
        pred = jnp.argmax(net.apply(params, x, s, r), -1)
        return jnp.sum((pred == y) * mask) / mask.sum()

    masks = {k: jnp.asarray(v) for k, v in masks.items()}
    key = jax.random.PRNGKey(2)
    for epoch in range(1, 101):
        key, k = jax.random.split(key)
        params, state, loss = step(params, state, k)
        if epoch % 20 == 0:
            print(f"epoch {epoch:3d}  loss {float(loss):.4f}  "
                  f"val {float(accuracy(params, masks['val'])):.3f}")
    print(f"test accuracy: {float(accuracy(params, masks['test'])):.3f}")


if __name__ == "__main__":
    main()
