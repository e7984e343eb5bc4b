#!/usr/bin/env python
"""GraphSAINT subgraph-sampled training — reference ``examples/graph_saint.py``
(random-walk sampler + normalization statistics)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data import GraphSAINTSampler
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.batch import pad_to_bucket
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import GraphConv
from examples._common import synthetic_planetoid


class Net(nn.Module):
    hidden: int
    classes: int

    @nn.compact
    def __call__(self, g):
        x = nn.relu(GraphConv(g.nodes.shape[-1], self.hidden)(g.nodes, g))
        x = GraphConv(self.hidden, self.classes)(x, g)
        return jax.nn.log_softmax(x)


def main():
    g, masks = synthetic_planetoid(n=1500, f=32)
    classes = int(g.y.max()) + 1
    sampler = GraphSAINTSampler(g, mode="walk", budget=200, walk_length=3,
                                num_steps=8, sample_coverage=10)
    node_norm = jnp.asarray(sampler.node_norm.astype(np.float32))
    model = Net(hidden=32, classes=classes)
    tx = optax.adam(3e-3)
    params = opt = None

    @jax.jit
    def step(params, opt, gg, labels, weight):
        def loss(p):
            logp = model.apply(p, gg)
            nll = -jnp.take_along_axis(logp, labels[:, None], 1)[:, 0]
            return jnp.sum(nll * weight) / jnp.maximum(jnp.sum(weight), 1e-9)
        l, grads = jax.value_and_grad(loss)(params)
        u, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), opt, l

    t0 = time.time()
    for epoch in range(6):
        tot = cnt = 0.0
        for sub, nodes in sampler:
            padded = pad_to_bucket(sub)
            gg = jax.tree_util.tree_map(jnp.asarray, padded)
            lab = np.zeros(padded.num_nodes, np.int32)
            lab[: len(nodes)] = np.asarray(g.y).reshape(-1)[nodes]
            w = np.zeros(padded.num_nodes, np.float32)
            # SAINT loss weight = node_norm * train_mask (reference :186)
            w[: len(nodes)] = sampler.node_norm[nodes] * masks["train"][nodes]
            if params is None:
                params = model.init(jax.random.key(0), gg)
                opt = tx.init(params)
            params, opt, l = step(params, opt, gg, jnp.asarray(lab), jnp.asarray(w))
            tot += float(l); cnt += 1
        print(f"epoch {epoch}: loss={tot/max(cnt,1):.4f} [{time.time()-t0:.1f}s]")

    # full-graph eval
    full = jax.tree_util.tree_map(jnp.asarray, pad_to_bucket(g))
    logp = model.apply(params, full)
    pred = np.asarray(logp.argmax(-1))[: int(g.n_node[0])]
    acc = (pred[masks["test"]] == np.asarray(g.y).reshape(-1)[masks["test"]]).mean()
    print(f"test accuracy: {acc:.4f}")


if __name__ == "__main__":
    main()
