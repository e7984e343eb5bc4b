#!/usr/bin/env python
"""Dynamic Graph CNN (DGCNN) shape classification — reference
``examples/dgcnn_classification.py``: EdgeConv blocks whose kNN graph is
recomputed in FEATURE space after each block (the "dynamic" in DGCNN)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import EdgeConv
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.utils.knn import knn_graph
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.segment import segment_max
from examples._common import synthetic_pointclouds

B, P, K = 8, 64, 8


class MLP(nn.Module):
    widths: tuple

    @nn.compact
    def __call__(self, h):
        for w in self.widths:
            h = nn.relu(nn.Dense(w)(h))
        return h


class Net(nn.Module):
    classes: int = 3

    @nn.compact
    def __call__(self, pos, batch):
        n = pos.shape[0]
        s, r = knn_graph(pos, K, batch)              # spatial graph
        x = EdgeConv(MLP((32, 32)))(pos, s, r, num_nodes=n)
        s, r = knn_graph(x, K, batch)                # dynamic: feature-space
        x = EdgeConv(MLP((64, 64)))(x, s, r, num_nodes=n)
        hg = segment_max(x, batch, num_segments=B)
        hg = nn.relu(nn.Dense(64)(hg))
        return jax.nn.log_softmax(nn.Dense(self.classes)(hg))


def main():
    clouds, y = synthetic_pointclouds(num=96, points=P, seed=4)
    batch = jnp.asarray(np.repeat(np.arange(B), P))
    net = Net()
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(np.concatenate(clouds[:B])), batch)
    opt = optax.adam(2e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state, pos, yb):
        def loss_fn(p):
            out = net.apply(p, pos, batch)
            return -jnp.mean(jnp.take_along_axis(out, yb[:, None], 1))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, state = opt.update(grads, state)
        return optax.apply_updates(params, upd), state, loss

    @jax.jit
    def n_correct(params, pos, yb):
        return jnp.sum(jnp.argmax(net.apply(params, pos, batch), -1) == yb)

    rng = np.random.default_rng(1)
    n_train = 72
    for epoch in range(1, 26):
        idx = rng.permutation(n_train)
        tot = 0.0
        for i in range(0, n_train - B + 1, B):
            sel = idx[i:i + B]
            pos = jnp.asarray(np.concatenate([clouds[j] for j in sel]))
            params, state, loss = step(params, state, pos, jnp.asarray(y[sel]))
            tot += float(loss)
        if epoch % 5 == 0:
            correct, total = 0, 0
            for i in range(n_train, len(clouds) - B + 1, B):
                pos = jnp.asarray(np.concatenate(clouds[i:i + B]))
                correct += int(n_correct(params, pos, jnp.asarray(y[i:i + B])))
                total += B
            print(f"epoch {epoch:3d}  loss {tot:.4f}  test acc {correct / total:.4f}")


if __name__ == "__main__":
    main()
