#!/usr/bin/env python
"""Graph classification with GraphConv + TopKPooling on a TU-style dataset —
reference ``examples/proteins_topk_pool.py``.  Uses real TU raw files under
data/TU/<name>/raw when present, else synthetic two-class graphs."""
import os, sys, time
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
    GraphConv,
    TopKPooling,
    global_max_pool,
    global_mean_pool,
)

B, N_PAD, E_PAD = 16, 512, 2048


def synthetic_tu(num=160, seed=0):
    """Class 0: ring graphs; class 1: star-ish graphs (distinguishable by
    pooled structure)."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(num):
        n = int(rng.integers(8, 24))
        cls = i % 2
        if cls == 0:
            s = np.arange(n); r = (s + 1) % n
        else:
            s = np.zeros(n - 1, np.int64); r = np.arange(1, n)
        ei = np.stack([np.concatenate([s, r]), np.concatenate([r, s])])
        x = rng.normal(size=(n, 8)).astype(np.float32)
        g = D.from_edge_index(x, ei)
        out.append(g._replace(y=np.asarray([cls], np.int32)))
    return out


class Net(nn.Module):
    @nn.compact
    def __call__(self, g):
        x = jax.nn.relu(GraphConv(8, 64)(g.nodes, g))
        out1 = TopKPooling(64, ratio=0.8)(g, x)
        g1, x1 = out1.graph, out1.graph.nodes
        s1 = jnp.concatenate(
            [global_mean_pool(x1, g1), global_max_pool(x1, g1)], axis=-1
        )
        x2 = jax.nn.relu(GraphConv(64, 64)(x1, g1))
        out2 = TopKPooling(64, ratio=0.8)(g1, x2)
        g2, x2 = out2.graph, out2.graph.nodes
        s2 = jnp.concatenate(
            [global_mean_pool(x2, g2), global_max_pool(x2, g2)], axis=-1
        )
        h = jax.nn.relu(nn.Dense(64)(s1 + s2))
        return jax.nn.log_softmax(nn.Dense(2)(h))


def batches(graphs, rng):
    idx = rng.permutation(len(graphs))
    for i in range(0, len(graphs) - B + 1, B):
        b = D.batch_graphs([graphs[j] for j in idx[i : i + B]])
        p = D.pad_graph(b, num_nodes=N_PAD, num_edges=E_PAD, num_graphs=B + 1)
        yield jax.tree_util.tree_map(jnp.asarray, p)


def main():
    try:
        from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets import TUDataset
        ds = TUDataset("data/TU/PROTEINS", "PROTEINS")
        graphs = [ds.get(i) for i in range(len(ds))]
        print("using real PROTEINS")
    except Exception:
        graphs = synthetic_tu()
        print("using synthetic TU-style graphs")
    split = int(0.8 * len(graphs))
    train, test = graphs[:split], graphs[split:]

    model = Net()
    rng = np.random.default_rng(0)
    p0 = next(batches(train, rng))
    params = model.init(jax.random.key(0), p0)
    tx = optax.adam(5e-3); opt = tx.init(params)

    @jax.jit
    def step(params, opt, p):
        y = jnp.asarray(p.y).reshape(-1)
        gmask = jnp.asarray(p.n_node > 0)

        def loss(pr):
            logp = model.apply(pr, p)
            nll = -jnp.take_along_axis(logp, y[:, None], 1)[:, 0]
            return jnp.sum(nll * gmask) / jnp.sum(gmask)

        l, grads = jax.value_and_grad(loss)(params)
        u, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), opt, l

    @jax.jit
    def correct(params, p):
        y = jnp.asarray(p.y).reshape(-1)
        gmask = p.n_node > 0
        pred = model.apply(params, p).argmax(-1)
        return jnp.sum((pred == y) * gmask), jnp.sum(gmask)

    t0 = time.time()
    for epoch in range(20):
        tot = 0.0; nb = 0
        for p in batches(train, rng):
            params, opt, l = step(params, opt, p)
            tot += float(l); nb += 1
        if epoch % 5 == 0:
            c = t = 0
            for p in batches(test, np.random.default_rng(1)):
                ci, ti = correct(params, p)
                c += int(ci); t += int(ti)
            print(f"epoch {epoch}: loss={tot / max(nb,1):.4f} "
                  f"test acc={c / max(t,1):.3f}")
    print(f"done in {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
