#!/usr/bin/env python
"""Dynamic neighborhood aggregation (DNA) — reference ``examples/dna.py``:
each layer attends from the receiver's latest representation over every
neighbor's FULL layer history [N, L, C] with grouped heads."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import flax.linen as nn

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import DNAConv
from examples._common import train_node_model


class Net(nn.Module):
    hidden: int = 32
    classes: int = 7
    num_layers: int = 4

    @nn.compact
    def __call__(self, x, senders, receivers, *, train=False):
        x = nn.relu(nn.Dense(self.hidden)(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x_all = x[:, None]                       # [N, 1, C] history
        for _ in range(self.num_layers):
            h = DNAConv(self.hidden, heads=4, groups=8)(
                x_all, senders, receivers)
            h = nn.Dropout(0.5, deterministic=not train)(h)
            x_all = jnp.concatenate([x_all, h[:, None]], axis=1)
        x = x_all[:, -1]
        x = nn.Dense(self.classes)(x)
        return jax.nn.log_softmax(x)


if __name__ == "__main__":
    train_node_model(Net(), epochs=100, lr=0.005)
