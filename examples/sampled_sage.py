#!/usr/bin/env python
"""Minibatch GraphSAGE with on-device fanout sampling — reference
``examples/reddit.py`` / ``multi_gpu/distributed_sampling.py`` flow."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data import NeighborSampler
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import SAGEConv
from examples._common import synthetic_planetoid


class SAGE(nn.Module):
    dims: tuple

    @nn.compact
    def __call__(self, h, blocks):
        for i, blk in enumerate(blocks):
            h_dst = h[: blk.num_dst]
            h = SAGEConv((h.shape[-1], h.shape[-1]), self.dims[i], name=f"conv{i}")(
                (h, h_dst), blk.senders, blk.receivers,
                num_nodes=blk.num_dst, edge_mask=blk.edge_mask,
            )
            if i < len(self.dims) - 1:
                h = nn.relu(h)
        return jax.nn.log_softmax(h)


def main():
    g, masks = synthetic_planetoid(n=2000, f=32)
    n = int(g.n_node[0])
    x = jnp.asarray(g.nodes)
    y = jnp.asarray(g.y).reshape(-1)
    classes = int(y.max()) + 1
    train_idx = np.nonzero(masks["train"])[0]
    loader = NeighborSampler(
        g.senders, g.receivers, n, sizes=[10, 5], node_idx=train_idx,
        batch_size=256, shuffle=True,
    )
    model = SAGE(dims=(32, classes))
    tx = optax.adam(3e-3)

    seeds, blocks = next(iter(loader))
    params = model.init(jax.random.key(0), x[blocks[0].src_ids], blocks)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, feats, blocks, labels):
        def loss(p):
            logp = model.apply(p, feats, blocks)
            return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))
        l, grads = jax.value_and_grad(loss)(params)
        u, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), opt, l

    t0 = time.time()
    for epoch in range(5):
        tot = cnt = 0.0
        for seeds, blocks in loader:
            params, opt, l = step(params, opt, x[blocks[0].src_ids], blocks, y[seeds])
            tot += float(l); cnt += 1
        print(f"epoch {epoch}: loss={tot/cnt:.4f} [{time.time()-t0:.1f}s]")
    # full eval through sampling (cheap here)
    correct = total = 0
    ev = NeighborSampler(g.senders, g.receivers, n, sizes=[10, 5],
                         node_idx=np.nonzero(masks["test"])[0], batch_size=256)
    for seeds, blocks in ev:
        logp = jax.jit(model.apply)(params, x[blocks[0].src_ids], blocks)
        correct += int(jnp.sum(logp.argmax(-1) == y[seeds]))
        total += len(seeds)
    print(f"test accuracy (sampled): {correct/max(total,1):.4f}")


if __name__ == "__main__":
    main()
