#!/usr/bin/env python
"""Node2Vec unsupervised embeddings + logistic-probe eval — reference
``examples/node2vec.py``.  Walks are generated fully on device."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.models import (
    Node2Vec,
    build_neighbor_table,
)
from examples._common import synthetic_planetoid


def main():
    g, masks = synthetic_planetoid()
    n = int(g.n_node[0])
    table = build_neighbor_table(np.asarray(g.senders), np.asarray(g.receivers), n)
    model = Node2Vec(num_nodes=n, embedding_dim=64, walk_length=10,
                     context_size=5, walks_per_node=4, num_negative_samples=1)
    starts = jnp.arange(n)
    params = model.init(jax.random.key(0), starts)
    tx = optax.adam(0.025); opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        l, grads = jax.value_and_grad(
            lambda p: model.apply(p, key, table, starts, method=Node2Vec.loss)
        )(params)
        u, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), opt, l

    key = jax.random.key(1)
    t0 = time.time()
    for epoch in range(60):
        key, sub = jax.random.split(key)
        params, opt, l = step(params, opt, sub)
        if epoch % 20 == 0:
            print(f"epoch {epoch}: skip-gram loss={float(l):.4f}")

    # logistic probe on frozen embeddings (reference uses sklearn; a tiny
    # softmax regression in optax keeps this dependency-free)
    z = np.asarray(model.apply(params, jnp.arange(n)))
    y = np.asarray(g.y).reshape(-1)
    w = jnp.zeros((z.shape[1], int(y.max()) + 1))
    b = jnp.zeros(int(y.max()) + 1)
    tm, testm = masks["train"], masks["test"]
    zt, yt = jnp.asarray(z[tm]), jnp.asarray(y[tm])
    probe_tx = optax.adam(0.1); pstate = probe_tx.init((w, b))

    @jax.jit
    def probe_step(wb, st):
        def loss(wb):
            w, b = wb
            logits = zt @ w + b
            return jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, yt)
            )
        l, gr = jax.value_and_grad(loss)(wb)
        u, st = probe_tx.update(gr, st)
        return optax.apply_updates(wb, u), st, l

    wb = (w, b)
    for _ in range(200):
        wb, pstate, _ = probe_step(wb, pstate)
    pred = np.asarray(jnp.argmax(jnp.asarray(z) @ wb[0] + wb[1], -1))
    acc = (pred[testm] == y[testm]).mean()
    print(f"probe test accuracy: {acc:.4f} ({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
