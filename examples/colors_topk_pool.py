#!/usr/bin/env python
"""COLORS-style counting with TopK attention pooling — reference
``examples/colors_topk_pool.py``: regress the number of "green" nodes in a
graph; the learnable TopK score should discover the green channel (the
reference reports the attention-vs-ground-truth correctness ratio)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu import data as D
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import (
    GraphConv, TopKPooling, global_add_pool)

B, N_PAD, E_PAD = 16, 512, 1024


def make_graphs(num=256, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(num):
        n = int(rng.integers(8, 24))
        # one-hot RGB colors; target = count of channel-1 ("green") nodes
        col = rng.integers(0, 3, n)
        x = np.eye(3, dtype=np.float32)[col]
        s = rng.integers(0, n, 2 * n)
        r = rng.integers(0, n, 2 * n)
        g = D.from_edge_index(x, np.stack([s, r]))
        out.append(g._replace(y=np.asarray([(col == 1).sum()], np.float32)))
    return out


class Net(nn.Module):
    @nn.compact
    def __call__(self, g):
        x = jax.nn.relu(GraphConv(3, 32)(g.nodes, g))
        out = TopKPooling(32, ratio=0.5)(g, x)
        hg = global_add_pool(out.graph.nodes, out.graph)
        return nn.Dense(1)(jax.nn.relu(nn.Dense(32)(hg)))[:, 0]


def main():
    graphs = make_graphs()
    rng = np.random.default_rng(1)
    net = Net()

    def padded(batch_graphs_):
        p = D.pad_graph(D.batch_graphs(batch_graphs_), num_nodes=N_PAD,
                        num_edges=E_PAD, num_graphs=B + 1)
        return jax.tree_util.tree_map(jnp.asarray, p)

    ex = padded(graphs[:B])
    params = net.init(jax.random.PRNGKey(0), ex)
    opt = optax.adam(5e-3)
    state = opt.init(params)
    gmask = jnp.asarray(np.arange(B + 1) < B)

    @jax.jit
    def step(params, state, g):
        def loss_fn(p):
            pred = net.apply(p, g)
            return jnp.sum((pred - g.y.reshape(-1)) ** 2 * gmask) / gmask.sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, state = opt.update(grads, state)
        return optax.apply_updates(params, upd), state, loss

    n_train = 192
    for epoch in range(1, 41):
        idx = rng.permutation(n_train)
        tot, nb = 0.0, 0
        for i in range(0, n_train - B + 1, B):
            g = padded([graphs[j] for j in idx[i:i + B]])
            params, state, loss = step(params, state, g)
            tot += float(loss); nb += 1
        if epoch % 10 == 0:
            errs = []
            for i in range(n_train, len(graphs) - B + 1, B):
                g = padded(graphs[i:i + B])
                pred = np.asarray(net.apply(params, g))[:B]
                errs.append(np.abs(pred - np.asarray(g.y).reshape(-1)[:B]))
            print(f"epoch {epoch:3d}  train mse {tot / nb:.3f}  "
                  f"test MAE {np.concatenate(errs).mean():.3f} (counting task)")


if __name__ == "__main__":
    main()
