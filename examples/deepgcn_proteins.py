#!/usr/bin/env python
"""DeeperGCN — reference ``examples/ogbn_proteins_deepgcn.py``: residual
GENConv blocks (norm -> relu -> conv -> +residual, "res+" ordering) with
softmax aggregation, multi-label edge-featured protein-style graphs
(synthetic stand-in for ogbn-proteins, which needs a download)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import GENConv
from examples._common import synthetic_planetoid

L = 4  # independent binary labels (ogbn-proteins has 112)


class DeeperGCN(nn.Module):
    hidden: int = 32
    num_layers: int = 6

    @nn.compact
    def __call__(self, x, senders, receivers, eattr, *, train=False):
        n = x.shape[0]
        h = nn.Dense(self.hidden)(x)
        for _ in range(self.num_layers):
            z = nn.LayerNorm()(h)
            z = jax.nn.relu(z)
            z = GENConv(self.hidden, self.hidden, aggr="softmax",
                        learn_t=True)(z, senders, receivers,
                                      edge_attr=eattr, num_nodes=n)
            h = h + z                              # res+ block
        return nn.Dense(L)(jax.nn.relu(nn.LayerNorm()(h)))


def main():
    g, masks = synthetic_planetoid(n=400, f=16, classes=4, seed=2)
    rng = np.random.default_rng(0)
    w = rng.normal(size=(g.nodes.shape[1], L))
    y = (np.asarray(g.nodes) @ w + 0.3 * rng.normal(size=(400, L)) > 0
         ).astype(np.float32)
    # GENConv adds edge features to messages, so edge dim == hidden dim
    eattr = rng.normal(size=(len(g.senders), 32)).astype(np.float32) * 0.1

    x = jnp.asarray(g.nodes)
    s, r = jnp.asarray(g.senders), jnp.asarray(g.receivers)
    ea = jnp.asarray(eattr)
    yj = jnp.asarray(y)
    net = DeeperGCN()
    params = net.init(jax.random.PRNGKey(0), x, s, r, ea)
    opt = optax.adam(5e-3)
    state = opt.init(params)
    tr = jnp.asarray(masks["train"])

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            logits = net.apply(p, x, s, r, ea)
            bce = optax.sigmoid_binary_cross_entropy(logits, yj).mean(-1)
            return jnp.sum(bce * tr) / tr.sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, state = opt.update(grads, state)
        return optax.apply_updates(params, upd), state, loss

    for epoch in range(1, 81):
        params, state, loss = step(params, state)
        if epoch % 20 == 0:
            logits = np.asarray(net.apply(params, x, s, r, ea))
            pred = logits > 0
            te = masks["test"]
            tp = np.sum(pred[te] & (y[te] > .5)); fp = np.sum(pred[te] & (y[te] < .5))
            fn_ = np.sum(~pred[te] & (y[te] > .5))
            f1 = 2 * tp / max(2 * tp + fp + fn_, 1e-12)
            print(f"epoch {epoch:3d}  loss {float(loss):.4f}  test micro-F1 {f1:.4f}")


if __name__ == "__main__":
    main()
