#!/usr/bin/env python
"""Inductive Deep Graph Infomax — reference
``examples/infomax_inductive.py`` (DGI with a sampled SAGE encoder on
Reddit; here: NeighborSampler minibatches over a synthetic community
graph, per-batch corruption + readout, then logistic-regression probe)."""
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
from examples._common import synthetic_planetoid

HID = 64


class Encoder(nn.Module):
    """2-layer sampled SAGE (the reference's inductive encoder)."""

    @nn.compact
    def __call__(self, h, blocks):
        for i, blk in enumerate(blocks):
            h_dst = h[: blk.num_dst]
            h = SAGEConv((h.shape[-1], h.shape[-1]), HID, name=f"conv{i}")(
                (h, h_dst), blk.senders, blk.receivers,
                num_nodes=blk.num_dst, edge_mask=blk.edge_mask)
            h = nn.PReLU()(h)
        return h


class DGI(nn.Module):
    @nn.compact
    def __call__(self, feats, blocks, corrupt_key):
        enc = Encoder()
        pos = enc(feats, blocks)
        perm = jax.random.permutation(corrupt_key, feats.shape[0])
        neg = enc(feats[perm], blocks)
        summary = jax.nn.sigmoid(jnp.mean(pos, axis=0))
        w = self.param("w", nn.initializers.xavier_uniform(), (HID, HID))
        eps = 1e-15
        p = jax.nn.sigmoid(pos @ w @ summary)
        n = jax.nn.sigmoid(neg @ w @ summary)
        loss = -jnp.mean(jnp.log(p + eps)) - jnp.mean(jnp.log(1 - n + eps))
        return loss, pos


def main():
    g, masks = synthetic_planetoid(n=2000, f=32)
    n = int(g.n_node[0])
    x = jnp.asarray(g.nodes)
    y = np.asarray(g.y).reshape(-1)
    loader = NeighborSampler(g.senders, g.receivers, n, sizes=[10, 10],
                             batch_size=256, shuffle=True)

    model = DGI()
    seeds, blocks = next(iter(loader))
    params = model.init(jax.random.key(0), x[blocks[0].src_ids], blocks,
                        jax.random.key(1))
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, feats, blocks, key):
        def loss(p):
            l, _ = model.apply(p, feats, blocks, key)
            return l
        l, grads = jax.value_and_grad(loss)(params)
        u, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), opt, l

    key = jax.random.key(2)
    for epoch in range(1, 6):
        tot, nb = 0.0, 0
        for seeds, blocks in loader:
            key, sub = jax.random.split(key)
            params, opt, l = step(params, opt, x[blocks[0].src_ids],
                                  blocks, sub)
            tot += float(l); nb += 1
        print(f"epoch {epoch}  DGI loss {tot / nb:.4f}")

    # inductive probe: embed every node through the sampler, fit a linear
    # classifier on train embeddings (reference uses sklearn LogReg)
    emb = np.zeros((n, HID), np.float32)
    probe_loader = NeighborSampler(g.senders, g.receivers, n,
                                   sizes=[10, 10], batch_size=256)
    for seeds, blocks in probe_loader:
        _, pos = model.apply(params, x[blocks[0].src_ids], blocks,
                             jax.random.key(0))
        emb[np.asarray(seeds)] = np.asarray(pos)

    wp = jnp.zeros((HID, int(y.max()) + 1))
    bp = jnp.zeros(int(y.max()) + 1)
    tm = np.asarray(masks["train"])
    ej, yj = jnp.asarray(emb[tm]), jnp.asarray(y[tm])

    @jax.jit
    def probe_step(wp, bp):
        def loss(args):
            w, b = args
            return optax.softmax_cross_entropy_with_integer_labels(
                ej @ w + b, yj).mean()
        gw, gb = jax.grad(loss)((wp, bp))
        return wp - 0.5 * gw, bp - 0.5 * gb

    for _ in range(200):
        wp, bp = probe_step(wp, bp)
    pred = np.asarray(jnp.argmax(jnp.asarray(emb) @ wp + bp, -1))
    test = np.asarray(masks["test"])
    print(f"probe test accuracy {np.mean(pred[test] == y[test]):.4f}")


if __name__ == "__main__":
    main()
