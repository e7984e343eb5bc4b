#!/usr/bin/env python
"""Sampled GAT at ogbn-products scale — reference
``examples/ogbn_products_gat.py``: NeighborSampler fanout [10, 10, 10],
bipartite GATConv blocks with skip connections (the reference's
``x + lin(x_target)`` residual), wide-fanout inference at the end.
Synthetic power-law products graph (no egress)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data import (
    NeighborSampler,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import GATConv
from examples.ogbn_products_sage import synth_products, N, C

F = 64
HID, HEADS = 32, 4
FANOUTS = [10, 10, 10]


class GAT(nn.Module):
    @nn.compact
    def __call__(self, h, blocks, *, train=False):
        dims = (HID, HID, C)
        heads = (HEADS, HEADS, 1)
        for i, blk in enumerate(blocks):
            h_dst = h[: blk.num_dst]
            concat = i < len(dims) - 1
            out = GATConv((h.shape[-1], h_dst.shape[-1]), dims[i],
                          heads=heads[i], concat=concat,
                          add_self_loops=False, name=f"conv{i}")(
                (h, h_dst), blk.senders, blk.receivers,
                num_nodes=blk.num_dst, edge_mask=blk.edge_mask,
                train=train)
            width = dims[i] * (heads[i] if concat else 1)
            out = out + nn.Dense(width, name=f"skip{i}")(h_dst)
            h = jax.nn.elu(out) if concat else out
        return jax.nn.log_softmax(h)


def main():
    x, send, recv, y = synth_products()
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    idx = np.arange(N)
    train_idx, test_idx = idx[: int(0.6 * N)], idx[int(0.8 * N):]
    loader = NeighborSampler(send, recv, N, sizes=FANOUTS,
                             node_idx=train_idx, batch_size=512,
                             shuffle=True)
    model = GAT()
    tx = optax.adam(2e-3)

    seeds, blocks = next(iter(loader))
    params = model.init(jax.random.key(0), xj[blocks[0].src_ids], blocks)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, feats, blocks, labels):
        def loss(p):
            logp = model.apply(p, feats, blocks)
            return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))
        l, grads = jax.value_and_grad(loss)(params)
        u, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), opt, l

    # STM_EX_EPOCHS: test-suite budget cap
    n_epochs = min(3, int(os.environ.get("STM_EX_EPOCHS", "3")))
    for epoch in range(1, n_epochs + 1):
        tot, nb = 0.0, 0
        for seeds, blocks in loader:
            params, opt, l = step(params, opt, xj[blocks[0].src_ids],
                                  blocks, yj[seeds])
            tot += float(l); nb += 1
        print(f"epoch {epoch}  loss {tot / nb:.4f}")

    infer = NeighborSampler(send, recv, N, sizes=[20, 15, 10],
                            node_idx=test_idx, batch_size=512)
    correct = total = 0
    for seeds, blocks in infer:
        logp = model.apply(params, xj[blocks[0].src_ids], blocks)
        correct += int(jnp.sum(jnp.argmax(logp, -1) == yj[seeds]))
        total += int(seeds.shape[0])
    print(f"test accuracy {correct / total:.4f}")


if __name__ == "__main__":
    main()
