#!/usr/bin/env python
"""MNIST superpixels with voxel-grid pooling — reference
``examples/mnist_voxel_grid.py`` (conv + 2D voxel_grid cluster max-pool
hierarchy; MNISTSuperpixels raws if present, else the synthetic
superpixel digits)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import GraphConv
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.pool import (
    voxel_grid,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.segment import (
    segment_max, segment_mean,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.utils.knn import (
    knn_graph,
)
from examples._common import synthetic_mnist_superpixels

P, K = 75, 8
GRID = 5          # 5x5 voxel grid over the unit square
N1 = GRID * GRID  # coarse budget per image


def load_digits():
    try:
        from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets \
            import MNISTSuperpixels

        ds = MNISTSuperpixels("data/MNIST", train=True)
        xs = np.stack([np.asarray(g.nodes[:, :1]) for g in ds._graphs[:200]])
        ps = np.stack([np.asarray(g.nodes[:, 1:]) for g in ds._graphs[:200]])
        ys = np.asarray([int(g.y[0]) for g in ds._graphs[:200]], np.int32)
        # normalize real positions to the unit square for the fixed grid
        ps = ps / max(ps.max(), 1e-9)
        return xs, ps, ys
    except Exception:
        return synthetic_mnist_superpixels(num=150)


def precompute(x, pos):
    """Host-side: kNN graph + voxel clusters + coarse grid adjacency."""
    s, r = (np.asarray(a) for a in knn_graph(jnp.asarray(pos), K))
    cl = np.asarray(voxel_grid(jnp.asarray(pos),
                               jnp.zeros(len(pos), jnp.int32),
                               1.0 / GRID, consecutive=False,
                               num_graphs=1))
    cl = np.minimum(cl, N1 - 1).astype(np.int32)
    cpos = segment_mean(jnp.asarray(pos), jnp.asarray(cl), N1)
    occupied = np.zeros(N1, bool)
    occupied[cl] = True
    cs, cr = (np.asarray(a) for a in knn_graph(
        cpos, 4, mask=jnp.asarray(occupied)))
    feat = np.concatenate([x, pos], axis=1)
    return feat, s, r, cl, cs, cr, occupied


class Net(nn.Module):
    @nn.compact
    def __call__(self, feat, s, r, cl, cs, cr, nmask):
        h = jax.nn.relu(GraphConv(3, 32)(feat, s, r,
                                         num_nodes=feat.shape[0]))
        h = segment_max(h, cl, N1)  # voxel-grid max-pool
        h = jax.nn.relu(GraphConv(32, 64)(h, cs, cr, num_nodes=N1))
        hg = jnp.max(jnp.where(nmask[:, None], h, -jnp.inf), axis=0)
        hg = nn.relu(nn.Dense(128)(hg))
        return jax.nn.log_softmax(nn.Dense(10)(hg))


def main():
    xs, ps, y = load_digits()
    feats = [tuple(jnp.asarray(a) for a in precompute(xs[i], ps[i]))
             for i in range(len(y))]
    net = Net()
    params = net.init(jax.random.PRNGKey(0), *feats[0])
    tx = optax.adam(2e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, args, yi):
        def loss(p):
            return -net.apply(p, *args)[yi]
        l, grads = jax.value_and_grad(loss)(params)
        u, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), opt, l

    @jax.jit
    def predict(params, args):
        return jnp.argmax(net.apply(params, *args))

    rng = np.random.default_rng(1)
    n_train = int(0.8 * len(y))
    for epoch in range(1, 16):
        tot = 0.0
        for i in rng.permutation(n_train):
            params, opt, l = step(params, opt, feats[i], int(y[i]))
            tot += float(l)
        if epoch % 5 == 0:
            correct = sum(int(predict(params, feats[i])) == int(y[i])
                          for i in range(n_train, len(y)))
            print(f"epoch {epoch:3d}  loss {tot / n_train:.4f}  "
                  f"test acc {correct / (len(y) - n_train):.4f}")


if __name__ == "__main__":
    main()
