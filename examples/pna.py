#!/usr/bin/env python
"""PNA on molecular graph regression — reference ``examples/pna.py``
(PNAConv towers over ZINC; here a ZINC-shaped synthetic molecular set:
integer atom types, bond-type edges, a structure-dependent target)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu import data
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import PNAConv
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.glob import (
    global_add_pool,
)

B = 16  # graphs per padded batch


def synth_zinc(num=128, seed=0):
    """ZINC-like molecules: 9-22 heavy atoms of 8 types, tree-ish bonds
    plus a few rings; target = a smooth function of type counts + cycles."""
    rng = np.random.default_rng(seed)
    graphs, ys = [], []
    for _ in range(num):
        n = int(rng.integers(9, 23))
        types = rng.integers(0, 8, n)
        s = list(range(1, n)); r = [int(rng.integers(0, i)) for i in range(1, n)]
        extra = rng.integers(0, 3)
        for _ in range(extra):  # ring closures
            a, b = rng.integers(0, n, 2)
            if a != b:
                s.append(int(a)); r.append(int(b))
        ei = np.stack([np.asarray(s + r), np.asarray(r + s)])
        y = 0.3 * np.bincount(types, minlength=8)[2] + 0.7 * extra \
            - 0.05 * n + 0.1 * rng.normal()
        x = np.zeros((n, 8), np.float32); x[np.arange(n), types] = 1.0
        graphs.append(data.from_edge_index(x, ei, num_nodes=n))
        ys.append(y)
    return graphs, np.asarray(ys, np.float32)


class Net(nn.Module):
    deg_avg_log: float

    @nn.compact
    def __call__(self, g):
        h = g.nodes
        for i in range(3):
            h = nn.relu(PNAConv(h.shape[-1], 64, towers=4,
                                deg_avg_log=self.deg_avg_log)(
                h, g.senders, g.receivers, num_nodes=h.shape[0]))
        hg = global_add_pool(h, g, num_graphs=B + 1)[:B]
        hg = nn.relu(nn.Dense(32)(hg))
        return nn.Dense(1)(hg)[:, 0]


def main():
    graphs, y = synth_zinc()
    # degree statistic over the training graphs (reference pna.py computes
    # the in-degree histogram; our layer takes avg log-degree directly)
    degs = np.concatenate([np.bincount(np.asarray(g.receivers),
                                       minlength=int(g.n_node[0]))
                           for g in graphs[:96]])
    deg_avg_log = float(np.mean(np.log(degs + 1)))

    def batch_of(idx):
        b = data.batch_graphs([graphs[j] for j in idx])
        return data.pad_to_bucket(b, num_graphs=B + 1, node_multiple=512,
                                  edge_multiple=1024)

    net = Net(deg_avg_log=deg_avg_log)
    g0 = batch_of(range(B))
    params = net.init(jax.random.key(0), g0)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, g, yb):
        def loss(p):
            return jnp.mean(jnp.abs(net.apply(p, g) - yb))  # MAE like ZINC
        l, grads = jax.value_and_grad(loss)(params)
        u, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), opt, l

    rng = np.random.default_rng(1)
    n_train = 96
    for epoch in range(1, 21):
        order = rng.permutation(n_train)
        tot = 0.0
        for i in range(0, n_train - B + 1, B):
            sel = order[i:i + B]
            params, opt, l = step(params, opt, batch_of(sel),
                                  jnp.asarray(y[sel]))
            tot += float(l)
        if epoch % 5 == 0:
            test_mae = 0.0; m = 0
            for i in range(n_train, len(graphs) - B + 1, B):
                pred = net.apply(params, batch_of(range(i, i + B)))
                test_mae += float(jnp.sum(jnp.abs(pred - y[i:i + B]))); m += B
            print(f"epoch {epoch:3d}  train MAE {tot / (n_train // B):.4f}  "
                  f"test MAE {test_mae / m:.4f}")


if __name__ == "__main__":
    main()
