#!/usr/bin/env python
"""Cluster-GCN: partition minibatches — reference ``examples/cluster_gcn_reddit.py``."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data import ClusterData, ClusterLoader
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import ClusterGCNConv
from examples._common import synthetic_planetoid


class Net(nn.Module):
    hidden: int
    classes: int

    @nn.compact
    def __call__(self, g):
        x = g.nodes
        x = nn.relu(ClusterGCNConv(x.shape[-1], self.hidden)(x, g))
        x = ClusterGCNConv(self.hidden, self.classes)(x, g)
        return jax.nn.log_softmax(x)


def main():
    g, masks = synthetic_planetoid(n=1200, f=32)
    classes = int(g.y.max()) + 1
    loader = ClusterLoader(ClusterData(g, num_parts=8), batch_size=2, shuffle=True)
    model = Net(hidden=32, classes=classes)
    tx = optax.adam(3e-3)
    padded, nodes = next(iter(loader))
    gj = jax.tree_util.tree_map(jnp.asarray, padded)
    params = model.init(jax.random.key(0), gj)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, g, labels, mask):
        def loss(p):
            logp = model.apply(p, g)
            nll = -jnp.take_along_axis(logp, labels[:, None], 1)[:, 0]
            return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)
        l, grads = jax.value_and_grad(loss)(params)
        u, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), opt, l

    t0 = time.time()
    for epoch in range(10):
        tot = cnt = 0.0
        for padded, nodes in loader:
            gj = jax.tree_util.tree_map(jnp.asarray, padded)
            lab = np.zeros(padded.num_nodes, np.int32)
            lab[: len(nodes)] = np.asarray(g.y).reshape(-1)[nodes]
            m = np.zeros(padded.num_nodes, np.float32)
            m[: len(nodes)] = masks["train"][nodes]
            params, opt, l = step(params, opt, gj, jnp.asarray(lab), jnp.asarray(m))
            tot += float(l); cnt += 1
        if epoch % 3 == 0:
            print(f"epoch {epoch}: loss={tot/max(cnt,1):.4f} [{time.time()-t0:.1f}s]")
    print("done")


if __name__ == "__main__":
    main()
