#!/usr/bin/env python
"""Dense hierarchical pooling graph classification — reference
``examples/proteins_diff_pool.py`` / ``examples/proteins_mincut_pool.py``:
DenseGCNConv towers with DiffPool or MinCut coarsening on padded dense
batches (the padded-tensor regime is the natural TPU shape)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.dense import (
    DenseGCNConv, dense_diff_pool, dense_mincut_pool)

N, F, CLASSES = 24, 8, 2


def synthetic_dense_graphs(num=128, seed=0):
    """Class 0: two dense communities; class 1: ring — distinguishable only
    through structure-aware pooling."""
    rng = np.random.default_rng(seed)
    xs, adjs, ys, masks = [], [], [], []
    for i in range(num):
        y = i % 2
        n = int(rng.integers(16, N + 1))
        adj = np.zeros((N, N), np.float32)
        if y == 0:
            half = n // 2
            for blk in (slice(0, half), slice(half, n)):
                sub = rng.random((N, N)) < 0.6
                adj[blk, blk] = sub[blk, blk]
        else:
            for t in range(n):
                adj[t, (t + 1) % n] = 1
        adj = np.maximum(adj, adj.T)
        np.fill_diagonal(adj, 0)
        x = rng.normal(size=(N, F)).astype(np.float32)
        mask = np.zeros(N, bool); mask[:n] = True
        x[~mask] = 0; adj[~mask] = 0; adj[:, ~mask] = 0
        xs.append(x); adjs.append(adj); ys.append(y); masks.append(mask)
    return (jnp.asarray(np.stack(xs)), jnp.asarray(np.stack(adjs)),
            jnp.asarray(np.asarray(ys)), jnp.asarray(np.stack(masks)))


class Net(nn.Module):
    pool: str = "diff"
    clusters: int = 6

    @nn.compact
    def __call__(self, x, adj, mask):
        h = nn.relu(DenseGCNConv(F, 32)(x, adj, mask=mask))
        s = DenseGCNConv(32, self.clusters)(h, adj, mask=mask)
        pool = dense_diff_pool if self.pool == "diff" else dense_mincut_pool
        h2, adj2, aux1, aux2 = pool(h, adj, s, mask=mask)
        h2 = nn.relu(DenseGCNConv(32, 32)(h2, adj2))
        g = h2.mean(axis=1)
        return nn.Dense(CLASSES)(g), aux1 + aux2


def run(pool):
    x, adj, y, mask = synthetic_dense_graphs()
    net = Net(pool=pool)
    params = net.init(jax.random.PRNGKey(0), x, adj, mask)
    opt = optax.adam(5e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            logits, aux = net.apply(p, x, adj, mask)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
            return ce + 0.5 * aux.mean(), logits
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, state = opt.update(grads, state)
        acc = (jnp.argmax(logits, -1) == y).mean()
        return optax.apply_updates(params, upd), state, loss, acc

    for epoch in range(1, 121):
        params, state, loss, acc = step(params, state)
        if epoch % 40 == 0:
            print(f"  [{pool}] epoch {epoch:3d}  loss {float(loss):.4f}  "
                  f"acc {float(acc):.3f}")
    return float(acc)


def main():
    for pool in ("diff", "mincut"):
        acc = run(pool)
        print(f"{pool}-pool final train accuracy: {acc:.3f}")


if __name__ == "__main__":
    main()
