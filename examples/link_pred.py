#!/usr/bin/env python
"""Supervised link prediction — reference ``examples/link_pred.py``: GCN
encoder on the train-edge graph, inner-product decoder, BCE over held-out
positive/negative edge pairs, AUC reported."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import GCNConv
from examples._common import synthetic_planetoid


class Encoder(nn.Module):
    hidden: int = 64
    out: int = 32

    @nn.compact
    def __call__(self, x, senders, receivers):
        n = x.shape[0]
        h = nn.relu(GCNConv(x.shape[-1], self.hidden)(
            x, senders, receivers, num_nodes=n))
        return GCNConv(self.hidden, self.out)(h, senders, receivers, num_nodes=n)


def auc(scores, labels):
    order = np.argsort(scores)
    ranks = np.empty_like(order, float); ranks[order] = np.arange(1, len(order) + 1)
    pos = labels.astype(bool)
    return (ranks[pos].sum() - pos.sum() * (pos.sum() + 1) / 2) / (
        pos.sum() * (~pos).sum())


def main():
    g, _ = synthetic_planetoid()
    rng = np.random.default_rng(0)
    # undirected edge list; hold out 10% of distinct pairs for testing
    pairs = np.unique(np.sort(np.stack([g.senders, g.receivers], 1), 1), axis=0)
    perm = rng.permutation(len(pairs))
    n_test = len(pairs) // 10
    test_pos, train_pos = pairs[perm[:n_test]], pairs[perm[n_test:]]
    s = np.concatenate([train_pos[:, 0], train_pos[:, 1]])
    r = np.concatenate([train_pos[:, 1], train_pos[:, 0]])

    n = g.nodes.shape[0]
    x = jnp.asarray(g.nodes)
    s, r = jnp.asarray(s), jnp.asarray(r)
    net = Encoder()
    params = net.init(jax.random.PRNGKey(0), x, s, r)
    opt = optax.adam(1e-2)
    state = opt.init(params)
    tp = jnp.asarray(train_pos)

    @jax.jit
    def step(params, state, key):
        neg = jax.random.randint(key, tp.shape, 0, n)

        def loss_fn(p):
            z = net.apply(p, x, s, r)
            pos = jnp.sum(z[tp[:, 0]] * z[tp[:, 1]], -1)
            ngt = jnp.sum(z[neg[:, 0]] * z[neg[:, 1]], -1)
            return -(jnp.mean(jax.nn.log_sigmoid(pos))
                     + jnp.mean(jax.nn.log_sigmoid(-ngt)))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, state = opt.update(grads, state)
        return optax.apply_updates(params, upd), state, loss

    key = jax.random.PRNGKey(1)
    for epoch in range(1, 101):
        key, sub = jax.random.split(key)
        params, state, loss = step(params, state, sub)
        if epoch % 20 == 0:
            print(f"epoch {epoch:3d}  loss {float(loss):.4f}")

    z = np.asarray(net.apply(params, x, s, r))
    test_neg = rng.integers(0, n, size=test_pos.shape)
    sc = np.concatenate([
        np.sum(z[test_pos[:, 0]] * z[test_pos[:, 1]], -1),
        np.sum(z[test_neg[:, 0]] * z[test_neg[:, 1]], -1),
    ])
    lab = np.concatenate([np.ones(len(test_pos)), np.zeros(len(test_neg))])
    print(f"test AUC: {auc(sc, lab):.4f}")


if __name__ == "__main__":
    main()
