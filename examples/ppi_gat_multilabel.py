#!/usr/bin/env python
"""Multi-label node classification with GAT — reference
``examples/ppi.py``: 3 GAT layers with residual connections, sigmoid BCE
over independent labels, micro-F1 reported (PPI-style synthetic data)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import GATConv
from examples._common import synthetic_planetoid

L = 6  # independent binary labels


class Net(nn.Module):
    hidden: int = 32
    heads: int = 4

    @nn.compact
    def __call__(self, x, senders, receivers, *, train=False):
        n = x.shape[0]
        h = GATConv(x.shape[-1], self.hidden, heads=self.heads)(
            x, senders, receivers, num_nodes=n)
        h = jax.nn.elu(h)
        h2 = GATConv(self.hidden * self.heads, self.hidden, heads=self.heads)(
            h, senders, receivers, num_nodes=n)
        h = jax.nn.elu(h2) + h                     # residual
        return GATConv(self.hidden * self.heads, L, heads=6, concat=False)(
            h, senders, receivers, num_nodes=n)


def micro_f1(logits, y):
    pred = (logits > 0)
    tp = float(np.sum(pred & (y > 0.5)))
    fp = float(np.sum(pred & (y < 0.5)))
    fn = float(np.sum(~pred & (y > 0.5)))
    return 2 * tp / max(2 * tp + fp + fn, 1e-12)


def main():
    g, masks = synthetic_planetoid(n=400, f=32, classes=4)
    rng = np.random.default_rng(0)
    # multi-label targets correlated with features through random hyperplanes
    w = rng.normal(size=(g.nodes.shape[1], L))
    y = (np.asarray(g.nodes) @ w + 0.3 * rng.normal(size=(400, L)) > 0
         ).astype(np.float32)

    x = jnp.asarray(g.nodes)
    s, r = jnp.asarray(g.senders), jnp.asarray(g.receivers)
    yj = jnp.asarray(y)
    net = Net()
    params = net.init(jax.random.PRNGKey(0), x, s, r)
    opt = optax.adam(5e-3)
    state = opt.init(params)
    tr = jnp.asarray(masks["train"])

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            logits = net.apply(p, x, s, r)
            bce = optax.sigmoid_binary_cross_entropy(logits, yj).mean(-1)
            return jnp.sum(bce * tr) / tr.sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, state = opt.update(grads, state)
        return optax.apply_updates(params, upd), state, loss

    for epoch in range(1, 101):
        params, state, loss = step(params, state)
        if epoch % 20 == 0:
            logits = np.asarray(net.apply(params, x, s, r))
            f1 = micro_f1(logits[masks["test"]], y[masks["test"]])
            print(f"epoch {epoch:3d}  loss {float(loss):.4f}  test micro-F1 {f1:.4f}")


if __name__ == "__main__":
    main()
