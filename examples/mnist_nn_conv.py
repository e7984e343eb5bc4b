#!/usr/bin/env python
"""MNIST superpixels with NNConv over pseudo-coordinates — reference
``examples/mnist_nn_conv.py`` (edge filters generated from relative
superpixel positions by an MLP; MNISTSuperpixels raws if present, else
the synthetic superpixel digits)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import NNConv
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.segment import (
    segment_max,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.utils.knn import (
    knn_graph,
)
from examples._common import synthetic_mnist_superpixels

P, K = 75, 8
B = 8


class EdgeMLP(nn.Module):
    out: int

    @nn.compact
    def __call__(self, e):
        h = nn.relu(nn.Dense(25)(e))
        return nn.Dense(self.out)(h)


class Net(nn.Module):
    @nn.compact
    def __call__(self, x, pos, batch):
        s, r = knn_graph(pos, K, batch)
        pseudo = pos[s] - pos[r]  # relative pseudo-coordinates
        h = jax.nn.relu(NNConv(1, 32, edge_mlp=EdgeMLP(1 * 32))(
            x, s, r, edge_attr=pseudo, num_nodes=x.shape[0]))
        s, r = knn_graph(pos, K, batch)
        pseudo = pos[s] - pos[r]
        h = jax.nn.relu(NNConv(32, 64, edge_mlp=EdgeMLP(32 * 64))(
            h, s, r, edge_attr=pseudo, num_nodes=x.shape[0]))
        hg = segment_max(h, batch, num_segments=B)  # global max per image
        hg = nn.relu(nn.Dense(128)(hg))
        return jax.nn.log_softmax(nn.Dense(10)(hg))


def load_digits():
    try:
        from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets \
            import MNISTSuperpixels

        ds = MNISTSuperpixels("data/MNIST", train=True)
        xs = np.stack([np.asarray(g.nodes[:, :1]) for g in ds._graphs[:240]])
        ps = np.stack([np.asarray(g.nodes[:, 1:]) for g in ds._graphs[:240]])
        ys = np.asarray([int(g.y[0]) for g in ds._graphs[:240]], np.int32)
        return xs, ps, ys
    except Exception:
        return synthetic_mnist_superpixels(num=160)


def main():
    xs, ps, y = load_digits()
    batch = jnp.asarray(np.repeat(np.arange(B), P))
    net = Net()
    params = net.init(jax.random.PRNGKey(0),
                      jnp.asarray(xs[:B].reshape(B * P, 1)),
                      jnp.asarray(ps[:B].reshape(B * P, 2)), batch)
    tx = optax.adam(2e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, x, pos, yb):
        def loss(p):
            out = net.apply(p, x, pos, batch)
            return -jnp.mean(jnp.take_along_axis(out, yb[:, None], 1))
        l, grads = jax.value_and_grad(loss)(params)
        u, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), opt, l

    @jax.jit
    def n_correct(params, x, pos, yb):
        out = net.apply(params, x, pos, batch)
        return jnp.sum(jnp.argmax(out, -1) == yb)

    rng = np.random.default_rng(1)
    n_train = (int(0.8 * len(y)) // B) * B
    n_test = ((len(y) - n_train) // B) * B
    for epoch in range(1, 16):
        idx = rng.permutation(n_train)
        tot = 0.0
        for i in range(0, n_train, B):
            sel = idx[i:i + B]
            params, opt, l = step(
                params, opt,
                jnp.asarray(xs[sel].reshape(B * P, 1)),
                jnp.asarray(ps[sel].reshape(B * P, 2)),
                jnp.asarray(y[sel]))
            tot += float(l)
        if epoch % 5 == 0:
            correct = 0
            for i in range(n_train, n_train + n_test, B):
                correct += int(n_correct(
                    params,
                    jnp.asarray(xs[i:i + B].reshape(B * P, 1)),
                    jnp.asarray(ps[i:i + B].reshape(B * P, 2)),
                    jnp.asarray(y[i:i + B])))
            print(f"epoch {epoch:3d}  loss {tot / (n_train // B):.4f}  "
                  f"test acc {correct / n_test:.4f}")


if __name__ == "__main__":
    main()
