#!/usr/bin/env python
"""MNIST superpixels with graclus pooling — reference
``examples/mnist_graclus.py`` (SplineConv-style conv + greedy-matching
max-pool hierarchy; MNISTSuperpixels raws if present, else the
synthetic superpixel digits)."""
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
    greedy_matching,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.segment import (
    segment_max,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.utils.knn import (
    knn_graph,
)
from examples._common import synthetic_mnist_superpixels

P, K = 75, 8
N1 = P  # coarse budget (greedy matching leaves unmatched singletons)


def load_digits():
    try:
        from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets \
            import MNISTSuperpixels

        ds = MNISTSuperpixels("data/MNIST", train=True)
        xs = np.stack([np.asarray(g.nodes[:, :1]) for g in ds._graphs[:200]])
        ps = np.stack([np.asarray(g.nodes[:, 1:]) for g in ds._graphs[:200]])
        ys = np.asarray([int(g.y[0]) for g in ds._graphs[:200]], np.int32)
        return xs, ps, ys
    except Exception:
        return synthetic_mnist_superpixels(num=150)


def precompute(x, pos):
    """Host-side: kNN graph over superpixel centers + one graclus level."""
    s, r = (np.asarray(a) for a in knn_graph(jnp.asarray(pos), K))
    cl = greedy_matching(s, r, len(pos))
    cpos = np.zeros((N1, 2), np.float32)
    np.add.at(cpos, cl, pos)
    cnt = np.zeros(N1, np.float32)
    np.add.at(cnt, cl, 1)
    cpos /= np.maximum(cnt, 1)[:, None]
    nmask = cnt > 0
    cs, cr = (np.asarray(a) for a in knn_graph(
        jnp.asarray(cpos), K, mask=jnp.asarray(nmask)))
    feat = np.concatenate([x, pos], axis=1)
    return feat, s, r, cl.astype(np.int32), cs, cr, nmask


class Net(nn.Module):
    @nn.compact
    def __call__(self, feat, s, r, cl, cs, cr, nmask):
        h = jax.nn.relu(GraphConv(3, 32)(feat, s, r,
                                         num_nodes=feat.shape[0]))
        h = segment_max(h, cl, N1)  # graclus max-pool level
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
