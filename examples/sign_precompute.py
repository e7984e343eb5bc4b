#!/usr/bin/env python
"""SIGN: precomputed multi-hop features + plain MLP heads — reference
``examples/sign.py``.  All graph work happens once in the transform; training
is pure dense matmuls (ideal MXU shape)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import flax.linen as nn
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.transforms import SIGN
from examples._common import synthetic_planetoid

K = 3


class SIGNNet(nn.Module):
    f: int         # per-hop feature width
    hidden: int
    classes: int

    @nn.compact
    def __call__(self, xs, *, train=False):
        # xs = [X ‖ X¹ ‖ … ‖ X^K]; one Dense head per hop, then concat
        hs = []
        for i in range(K + 1):
            h = nn.Dense(self.hidden, name=f"hop_{i}")(
                xs[:, i * self.f : (i + 1) * self.f]
            )
            hs.append(nn.relu(h))
        h = jnp.concatenate(hs, axis=-1)
        h = nn.Dropout(0.5, deterministic=not train)(h)
        return jax.nn.log_softmax(nn.Dense(self.classes)(h))


def main():
    g, masks = synthetic_planetoid()
    f = g.nodes.shape[1]
    g = SIGN(K)(g)  # one-time precompute
    xs = jnp.asarray(g.nodes)
    y = jnp.asarray(g.y).reshape(-1)
    tm = jnp.asarray(masks["train"]); vm = jnp.asarray(masks["val"])
    model = SIGNNet(f, 64, int(y.max()) + 1)
    params = model.init(jax.random.key(0), xs)
    tx = optax.adam(0.01); opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        def loss(p):
            logp = model.apply(p, xs, train=True, rngs={"dropout": key})
            nll = -jnp.take_along_axis(logp, y[:, None], 1)[:, 0]
            return jnp.sum(nll * tm) / jnp.sum(tm)
        l, grads = jax.value_and_grad(loss)(params)
        u, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), opt, l

    @jax.jit
    def acc(params, mask):
        pred = model.apply(params, xs).argmax(-1)
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
