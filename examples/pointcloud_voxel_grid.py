#!/usr/bin/env python
"""Voxel-grid pooling classification — reference
``examples/mnist_voxel_grid.py``: kNN graph conv on raw points, then
voxel-grid clustering + pool_graph to coarsen, conv again on the coarse
graph, global readout.  Pooling is host-side (like the reference's
``grid_cluster`` called from the data loader side); convs run jitted."""
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
    pool_graph, voxel_grid)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.graph import Graph
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.utils.knn import knn_graph
from examples._common import synthetic_pointclouds

P, K = 64, 8
N_COARSE = 48  # fixed coarse budget per cloud (pad/truncate)


def coarsen(pos):
    """Host-side: kNN graph on points -> voxel clusters -> pooled graph with
    [mean-pos || count] features, padded to N_COARSE nodes / 4*K*N edges."""
    s, r = knn_graph(jnp.asarray(pos), K)
    g = Graph(nodes=np.concatenate([pos, np.ones((len(pos), 1), np.float32)], 1),
              senders=np.asarray(s), receivers=np.asarray(r),
              n_node=np.asarray([len(pos)], np.int32),
              n_edge=np.asarray([len(np.asarray(s))], np.int32))
    cl = np.asarray(voxel_grid(jnp.asarray(pos), jnp.zeros(len(pos), jnp.int32),
                               0.5, consecutive=True, num_graphs=1))
    cg = pool_graph(cl, g, aggr="mean")
    n, e = int(cg.n_node[0]), int(cg.n_edge[0])
    nodes = np.zeros((N_COARSE, 4), np.float32)
    nodes[:min(n, N_COARSE)] = np.asarray(cg.nodes)[:N_COARSE]
    es = np.full(4 * K * N_COARSE, 0, np.int32)
    er = np.full(4 * K * N_COARSE, 0, np.int32)
    m = min(e, len(es))
    es[:m] = np.asarray(cg.senders)[:m]
    er[:m] = np.asarray(cg.receivers)[:m]
    emask = np.zeros(len(es), bool); emask[:m] = True
    nmask = np.zeros(N_COARSE, bool); nmask[:min(n, N_COARSE)] = True
    return nodes, es, er, emask, nmask


class Net(nn.Module):
    classes: int = 3

    @nn.compact
    def __call__(self, nodes, s, r, emask, nmask):
        h = jax.nn.relu(GraphConv(4, 32)(nodes, s, r, edge_mask=emask))
        h = jax.nn.relu(GraphConv(32, 64)(h, s, r, edge_mask=emask))
        hg = jnp.max(jnp.where(nmask[:, None], h, -jnp.inf), axis=0)
        hg = nn.relu(nn.Dense(64)(hg))
        return jax.nn.log_softmax(nn.Dense(self.classes)(hg))


def main():
    clouds, y = synthetic_pointclouds(num=96, points=P, seed=7)
    feats = [coarsen(c) for c in clouds]
    net = Net()
    args0 = tuple(jnp.asarray(a) for a in feats[0])
    params = net.init(jax.random.PRNGKey(0), *args0)
    opt = optax.adam(2e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state, args, yi):
        def loss_fn(p):
            out = net.apply(p, *args)
            return -out[yi]
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, state = opt.update(grads, state)
        return optax.apply_updates(params, upd), state, loss

    @jax.jit
    def predict(params, args):
        return jnp.argmax(net.apply(params, *args))

    rng = np.random.default_rng(1)
    n_train = 72
    jfeats = [tuple(jnp.asarray(a) for a in f) for f in feats]
    for epoch in range(1, 16):
        tot = 0.0
        for j in rng.permutation(n_train):
            params, state, loss = step(params, state, jfeats[j], int(y[j]))
            tot += float(loss)
        if epoch % 5 == 0:
            acc = np.mean([int(predict(params, jfeats[j])) == y[j]
                           for j in range(n_train, len(clouds))])
            print(f"epoch {epoch:3d}  loss {tot:.3f}  test acc {acc:.4f}")


if __name__ == "__main__":
    main()
