#!/usr/bin/env python
"""Sampled GraphSAGE at ogbn-products scale — reference
``examples/ogbn_products_sage.py``: NeighborSampler fanout [15, 10, 5]
training + full layer-wise inference for the final accuracy.  The graph
is synthesized at reduced products shape (no egress): power-law
co-purchase structure whose labels diffuse over neighborhoods."""
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
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import SAGEConv

N, E, F, C = 20_000, 120_000, 64, 12
HID = 128
FANOUTS = [15, 10, 5]


def synth_products(seed=0):
    rng = np.random.default_rng(seed)
    pop = rng.zipf(1.5, size=N).astype(np.float64)
    recv = rng.choice(N, size=E, p=pop / pop.sum()).astype(np.int32)
    send = rng.integers(0, N, size=E).astype(np.int32)
    y0 = rng.integers(0, C, N)
    # one majority-vote diffusion step -> neighborhood-correlated labels
    onehot = np.zeros((N, C))
    onehot[np.arange(N), y0] = 1.0
    votes = onehot.copy()
    np.add.at(votes, recv, onehot[send])
    y = votes.argmax(1).astype(np.int32)
    centers = rng.normal(size=(C, F)).astype(np.float32)
    x = centers[y] + 1.2 * rng.normal(size=(N, F)).astype(np.float32)
    return x, send, recv, y


class SAGE(nn.Module):
    dims: tuple

    @nn.compact
    def __call__(self, h, blocks):
        for i, blk in enumerate(blocks):
            h_dst = h[: blk.num_dst]
            h = SAGEConv((h.shape[-1], h.shape[-1]), self.dims[i],
                         name=f"conv{i}")(
                (h, h_dst), blk.senders, blk.receivers,
                num_nodes=blk.num_dst, edge_mask=blk.edge_mask)
            if i < len(self.dims) - 1:
                h = nn.relu(h)
        return jax.nn.log_softmax(h)


def main():
    x, send, recv, y = synth_products()
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    idx = np.arange(N)
    train_idx, test_idx = idx[: int(0.6 * N)], idx[int(0.8 * N):]
    loader = NeighborSampler(send, recv, N, sizes=FANOUTS,
                             node_idx=train_idx, batch_size=512,
                             shuffle=True)
    model = SAGE(dims=(HID, HID, C))
    tx = optax.adam(3e-3)

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

    for epoch in range(1, 4):
        tot, nb = 0.0, 0
        for seeds, blocks in loader:
            params, opt, l = step(params, opt, xj[blocks[0].src_ids],
                                  blocks, yj[seeds])
            tot += float(l); nb += 1
        print(f"epoch {epoch}  loss {tot / nb:.4f}")

    # full inference through the sampler with wide fanout (the reference
    # runs exact layer-wise inference; a wide sample approximates it
    # within the static-shape pipeline)
    infer = NeighborSampler(send, recv, N, sizes=[25, 15, 10],
                            node_idx=test_idx, batch_size=512)
    correct = total = 0
    for seeds, blocks in infer:
        logp = model.apply(params, xj[blocks[0].src_ids], blocks)
        correct += int(jnp.sum(jnp.argmax(logp, -1) == yj[seeds]))
        total += int(seeds.shape[0])
    print(f"test accuracy {correct / total:.4f}")


if __name__ == "__main__":
    main()
