#!/usr/bin/env python
"""Topology-adaptive GCN — reference ``examples/tagcn.py``: two TAGConv
layers (each a learned polynomial in the normalized adjacency, K=3)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import flax.linen as nn

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import TAGConv
from examples._common import train_node_model


class Net(nn.Module):
    features: int = 64
    hidden: int = 16
    classes: int = 7

    @nn.compact
    def __call__(self, x, senders, receivers, *, train=False):
        x = nn.relu(TAGConv(self.features, self.hidden)(x, senders, receivers))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = TAGConv(self.hidden, self.classes)(x, senders, receivers)
        return jax.nn.log_softmax(x)


if __name__ == "__main__":
    train_node_model(Net(), epochs=100, lr=0.01)
