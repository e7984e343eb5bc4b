#!/usr/bin/env python
"""Graph U-Net node classification — reference ``examples/graph_unet.py``:
GCN + TopK encoder, skip connections, additive decoder.  Static pooling
budgets keep one compilation across depths."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data import (
    batch_graphs, pad_to_bucket)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.models import GraphUNet
from examples._common import synthetic_planetoid


def main():
    g, masks = synthetic_planetoid(n=300, f=32)
    gb = pad_to_bucket(batch_graphs([g]), num_graphs=2)
    gb = jax.tree_util.tree_map(jnp.asarray, gb)
    n = g.nodes.shape[0]
    y = jnp.asarray(g.y)
    train = jnp.asarray(masks["train"])

    unet = GraphUNet(32, 48, int(np.asarray(y).max()) + 1, depth=3)
    params = unet.init(jax.random.PRNGKey(0), gb)
    opt = optax.adam(5e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            out = jax.nn.log_softmax(unet.apply(p, gb))[:n]
            ll = -jnp.take_along_axis(out, y[:, None], 1)[:, 0]
            return jnp.sum(ll * train) / train.sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, state = opt.update(grads, state)
        return optax.apply_updates(params, upd), state, loss

    @jax.jit
    def accuracy(params, mask):
        pred = jnp.argmax(unet.apply(params, gb)[:n], -1)
        return jnp.sum((pred == y) * mask) / mask.sum()

    for epoch in range(1, 81):
        params, state, loss = step(params, state)
        if epoch % 20 == 0:
            print(f"epoch {epoch:3d}  loss {float(loss):.4f}  "
                  f"val {float(accuracy(params, jnp.asarray(masks['val']))):.3f}")
    print(f"test accuracy: "
          f"{float(accuracy(params, jnp.asarray(masks['test']))):.3f}")


if __name__ == "__main__":
    main()
