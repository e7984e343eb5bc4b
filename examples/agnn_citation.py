#!/usr/bin/env python
"""Attention-based GNN (AGNN) node classification — reference
``examples/agnn.py``: Dense -> 2x parameter-light cosine-attention
propagation layers -> Dense."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import flax.linen as nn

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import AGNNConv
from examples._common import train_node_model


class Net(nn.Module):
    hidden: int = 16
    classes: int = 7

    @nn.compact
    def __call__(self, x, senders, receivers, *, train=False):
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(self.hidden)(x))
        x = AGNNConv(requires_grad=False)(x, senders, receivers)
        x = AGNNConv(requires_grad=True)(x, senders, receivers)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Dense(self.classes)(x)
        return jax.nn.log_softmax(x)


if __name__ == "__main__":
    train_node_model(Net(), epochs=100, lr=0.01)
