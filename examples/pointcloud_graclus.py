#!/usr/bin/env python
"""Graclus-pooled point-cloud classification — reference
``examples/mnist_graclus.py``: conv -> graclus matching pool -> conv ->
readout.  The greedy matching is host-side (the reference calls
torch-cluster's C++ graclus); convs run jitted on fixed coarse shapes."""
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
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.pool import greedy_matching
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.utils.knn import knn_graph
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.segment import (
    segment_max, segment_mean)
from examples._common import synthetic_pointclouds

P, K = 64, 8
N1 = P // 2 + 4  # coarse budget after one matching level (≥ ceil(P/2))


def precompute(pos):
    """Host-side: kNN edges + graclus cluster map + coarse kNN edges."""
    s, r = (np.asarray(a) for a in knn_graph(jnp.asarray(pos), K))
    cl = greedy_matching(s, r, len(pos))
    cpos = np.zeros((N1, 3), np.float32)
    np.add.at(cpos, cl, pos)
    cnt = np.zeros(N1, np.float32); np.add.at(cnt, cl, 1)
    cpos /= np.maximum(cnt, 1)[:, None]
    nmask = cnt > 0
    cs, cr = (np.asarray(a) for a in knn_graph(
        jnp.asarray(cpos), K, mask=jnp.asarray(nmask)))
    return (pos, s, r, cl.astype(np.int32), cs, cr, nmask)


class Net(nn.Module):
    classes: int = 3

    @nn.compact
    def __call__(self, pos, s, r, cl, cs, cr, nmask):
        h = jax.nn.relu(GraphConv(3, 32)(pos, s, r, num_nodes=pos.shape[0]))
        h = segment_max(h, cl, N1)                       # graclus max-pool
        h = jax.nn.relu(GraphConv(32, 64)(h, cs, cr, num_nodes=N1))
        hg = jnp.max(jnp.where(nmask[:, None], h, -jnp.inf), axis=0)
        hg = nn.relu(nn.Dense(64)(hg))
        return jax.nn.log_softmax(nn.Dense(self.classes)(hg))


def main():
    clouds, y = synthetic_pointclouds(num=96, points=P, seed=11)
    feats = [tuple(jnp.asarray(a) for a in precompute(c)) for c in clouds]
    net = Net()
    params = net.init(jax.random.PRNGKey(0), *feats[0])
    opt = optax.adam(2e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state, args, yi):
        def loss_fn(p):
            return -net.apply(p, *args)[yi]
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, state = opt.update(grads, state)
        return optax.apply_updates(params, upd), state, loss

    @jax.jit
    def predict(params, args):
        return jnp.argmax(net.apply(params, *args))

    rng = np.random.default_rng(1)
    n_train = 72
    for epoch in range(1, 16):
        tot = 0.0
        for j in rng.permutation(n_train):
            params, state, loss = step(params, state, feats[j], int(y[j]))
            tot += float(loss)
        if epoch % 5 == 0:
            acc = np.mean([int(predict(params, feats[j])) == y[j]
                           for j in range(n_train, len(clouds))])
            print(f"epoch {epoch:3d}  loss {tot:.3f}  test acc {acc:.4f}")


if __name__ == "__main__":
    main()
