#!/usr/bin/env python
"""GIN graph classification — reference ``examples/mutag_gin.py``: 3 GIN
layers (each an MLP over (1+eps)x_i + sum_j x_j) + global add pool + MLP
head, on MUTAG raw files when present, else synthetic two-class graphs."""
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
    GINConv,
    global_add_pool,
)

B, N_PAD, E_PAD = 16, 512, 2048
F_IN = 8


def synthetic_mutag(num=160, seed=0):
    """Class 0: two fused rings; class 1: ring with pendant chain."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(num):
        n = int(rng.integers(10, 24))
        cls = i % 2
        s = list(range(n)); r = [(j + 1) % n for j in range(n)]
        if cls == 0:
            s += [0]; r += [n // 2]          # chord -> fused rings
        else:
            s += [0, n - 1]; r += [n - 1, n - 2]  # pendant edges
        ei = np.stack([np.asarray(s + r), np.asarray(r + s)])
        x = np.zeros((n, F_IN), np.float32)
        x[np.arange(n), rng.integers(0, F_IN, n)] = 1.0  # atom-type one-hots
        g = D.from_edge_index(x, ei)
        out.append(g._replace(y=np.asarray([cls], np.int32)))
    return out


class MLP(nn.Module):
    width: int

    @nn.compact
    def __call__(self, h):
        h = nn.relu(nn.Dense(self.width)(h))
        return nn.Dense(self.width)(h)


class Net(nn.Module):
    width: int = 32

    @nn.compact
    def __call__(self, g):
        h = g.nodes
        for _ in range(3):
            h = nn.relu(GINConv(MLP(self.width), train_eps=True)(
                h, g.senders, g.receivers, num_nodes=h.shape[0]))
        hg = global_add_pool(h, g)
        hg = nn.relu(nn.Dense(self.width)(hg))
        return jax.nn.log_softmax(nn.Dense(2)(hg))


def main():
    graphs = synthetic_mutag()
    rng = np.random.default_rng(1)
    net = Net()
    ex = D.pad_graph(D.batch_graphs(graphs[:B]), num_nodes=N_PAD,
                     num_edges=E_PAD, num_graphs=B + 1)
    ex = jax.tree_util.tree_map(jnp.asarray, ex)
    params = net.init(jax.random.PRNGKey(0), ex)
    opt = optax.adam(5e-3)
    state = opt.init(params)
    gmask = jnp.asarray(np.arange(B + 1) < B)

    @jax.jit
    def step(params, state, g):
        def loss_fn(p):
            out = net.apply(p, g)
            y = g.y.reshape(-1)
            ll = -jnp.take_along_axis(out, y[:, None].astype(jnp.int32), 1)[:, 0]
            return jnp.sum(ll * gmask) / gmask.sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, state = opt.update(grads, state)
        return optax.apply_updates(params, upd), state, loss

    @jax.jit
    def n_correct(params, g):
        pred = jnp.argmax(net.apply(params, g), -1)
        return jnp.sum((pred == g.y.reshape(-1)) * gmask)

    def batches():
        idx = rng.permutation(len(graphs))
        for i in range(0, len(graphs) - B + 1, B):
            b = D.batch_graphs([graphs[j] for j in idx[i:i + B]])
            p = D.pad_graph(b, num_nodes=N_PAD, num_edges=E_PAD, num_graphs=B + 1)
            yield jax.tree_util.tree_map(jnp.asarray, p)

    for epoch in range(1, 31):
        tot = 0.0
        for g in batches():
            params, state, loss = step(params, state, g)
            tot += float(loss)
        if epoch % 5 == 0:
            acc = sum(float(n_correct(params, g)) for g in batches()) / (
                len(graphs) // B * B)
            print(f"epoch {epoch:3d}  loss {tot:.4f}  train acc {acc:.4f}")


if __name__ == "__main__":
    main()
