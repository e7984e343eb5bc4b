#!/usr/bin/env python
"""PairNorm vs over-smoothing in deep GCNs — reference
``norm/pair_norm.py`` (the PairNorm paper's motivating experiment): stack
many GCN layers; without normalization node features collapse toward a
constant and accuracy degrades, PairNorm keeps them separated."""
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
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.norm import PairNorm
from examples._common import synthetic_planetoid

DEPTH = 20


class DeepGCN(nn.Module):
    use_pairnorm: bool
    classes: int = 7

    @nn.compact
    def __call__(self, x, s, r):
        h = nn.Dense(32)(x)
        for i in range(DEPTH):
            h = GCNConv(32, 32, name=f"conv{i}")(h, s, r,
                                                 num_nodes=x.shape[0])
            if self.use_pairnorm:
                h = PairNorm()(h)
            h = nn.relu(h)
        return jax.nn.log_softmax(nn.Dense(self.classes)(h))


def feature_spread(h):
    h = np.asarray(h)
    return float(np.linalg.norm(h - h.mean(0, keepdims=True))
                 / max(np.linalg.norm(h), 1e-12))


def run(use_pairnorm, g, masks):
    x, s, r = jnp.asarray(g.nodes), jnp.asarray(g.senders), jnp.asarray(g.receivers)
    y = jnp.asarray(g.y)
    net = DeepGCN(use_pairnorm)
    params = net.init(jax.random.PRNGKey(0), x, s, r)
    opt = optax.adam(5e-3)
    state = opt.init(params)
    train = jnp.asarray(masks["train"])

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            out = net.apply(p, x, s, r)
            ll = -jnp.take_along_axis(out, y[:, None], 1)[:, 0]
            return jnp.sum(ll * train) / train.sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, state = opt.update(grads, state)
        return optax.apply_updates(params, upd), state

    for _ in range(120):
        params, state = step(params, state)
    out = net.apply(params, x, s, r)
    test = jnp.asarray(masks["test"])
    acc = float(jnp.sum((jnp.argmax(out, -1) == y) * test) / test.sum())
    return acc, feature_spread(out)


def main():
    g, masks = synthetic_planetoid(n=400, f=32)
    acc0, spread0 = run(False, g, masks)
    acc1, spread1 = run(True, g, masks)
    print(f"{DEPTH}-layer GCN, no norm : test acc {acc0:.3f}  "
          f"logit spread {spread0:.3f}")
    print(f"{DEPTH}-layer GCN, PairNorm: test acc {acc1:.3f}  "
          f"logit spread {spread1:.3f}")
    assert acc1 > acc0, "PairNorm should rescue the deep stack"


if __name__ == "__main__":
    main()
