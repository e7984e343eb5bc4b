#!/usr/bin/env python
"""GeniePath adaptive receptive fields — reference ``examples/geniepath.py``:
breadth = GATConv attention per hop, depth = LSTM gating over the hop
sequence (the LSTM state decides how much of each depth to absorb)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import flax.linen as nn

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import GATConv
from examples._common import train_node_model


class GeniePath(nn.Module):
    features: int = 64
    hidden: int = 32
    classes: int = 7
    num_layers: int = 3

    @nn.compact
    def __call__(self, x, senders, receivers, *, train=False):
        n = x.shape[0]
        h = nn.Dense(self.hidden)(x)
        lstm = nn.OptimizedLSTMCell(self.hidden)
        carry = lstm.initialize_carry(jax.random.PRNGKey(0), h.shape)
        for _ in range(self.num_layers):
            # breadth: attention over neighbors
            z = jnp.tanh(GATConv(self.hidden, self.hidden, heads=1,
                                 concat=False)(h, senders, receivers,
                                               num_nodes=n))
            # depth: LSTM gate decides what to keep from this hop
            carry, h = lstm(carry, z)
        return jax.nn.log_softmax(nn.Dense(self.classes)(h))


if __name__ == "__main__":
    train_node_model(GeniePath(), epochs=100, lr=0.005)
