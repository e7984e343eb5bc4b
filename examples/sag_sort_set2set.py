#!/usr/bin/env python
"""Graph-classification readout zoo — reference ``examples/sag_pool.py`` /
``examples/enzymes_topk_pool.py`` / DGCNN's sort pool / Set2Set: one GNN
trunk, four pooling heads compared on the same synthetic TU-style task."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data import (
    batch_graphs, pad_to_bucket, from_edge_index)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import (
    GraphConv, global_mean_pool)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.glob import (
    GlobalAttention, Set2Set, global_sort_pool)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.pool import (
    SAGPooling)

G, F = 48, 6


def make_dataset(seed=0):
    """Class = ring vs two-cliques (structure-only signal)."""
    rng = np.random.default_rng(seed)
    graphs, ys = [], []
    for i in range(G):
        y = i % 2
        n = int(rng.integers(10, 16))
        if y:
            s = np.arange(n); r = (s + 1) % n
        else:
            h = n // 2
            s, r = [], []
            for blk in (range(0, h), range(h, n)):
                for a in blk:
                    for b in blk:
                        if a < b:
                            s.append(a); r.append(b)
            s, r = np.asarray(s), np.asarray(r)
        ei = np.stack([np.concatenate([s, r]), np.concatenate([r, s])])
        x = rng.normal(size=(n, F)).astype(np.float32)
        graphs.append(from_edge_index(x, ei, num_nodes=n))
        ys.append(y)
    batch = pad_to_bucket(batch_graphs(graphs), num_graphs=G + 1)
    return batch, jnp.asarray(np.asarray(ys))


class Net(nn.Module):
    head: str

    @nn.compact
    def __call__(self, g):
        h = nn.relu(GraphConv(F, 32)(g.nodes, g))
        h = nn.relu(GraphConv(32, 32)(h, g))
        gg = g.replace(nodes=h)
        if self.head == "sag":
            pooled = SAGPooling(32, ratio=0.5)(gg)
            z = global_mean_pool(pooled.graph.nodes, pooled.graph)
        elif self.head == "sort":
            z = global_sort_pool(h, g, k=8)
        elif self.head == "set2set":
            z = Set2Set(32, processing_steps=3)(h, g)
        else:  # attention
            z = GlobalAttention(gate_nn=nn.Dense(1))(h, g)
        return nn.Dense(2)(z)[:G]


def run(head, batch, y):
    net = Net(head)
    params = net.init(jax.random.PRNGKey(0), batch)
    opt = optax.adam(5e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            logits = net.apply(p, batch)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean(), logits
        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        upd, state = opt.update(grads, state)
        return (optax.apply_updates(params, upd), state,
                (jnp.argmax(logits, -1) == y).mean())

    acc = 0.0
    for _ in range(120):
        params, state, acc = step(params, state)
    return float(acc)


def main():
    batch, y = make_dataset()
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    for head in ("sag", "sort", "set2set", "attention"):
        print(f"{head:<10} final train accuracy: {run(head, batch, y):.3f}")


if __name__ == "__main__":
    main()
