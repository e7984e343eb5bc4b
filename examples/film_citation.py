#!/usr/bin/env python
"""FiLM-conditioned GNN node classification — reference
``examples/film.py``: stacked FiLMConv layers whose per-receiver (gamma,
beta) modulate the neighbor messages feature-wise."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import flax.linen as nn

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import FiLMConv
from examples._common import train_node_model


class Net(nn.Module):
    features: int = 64
    hidden: int = 32
    classes: int = 7
    num_layers: int = 3

    @nn.compact
    def __call__(self, x, senders, receivers, *, train=False):
        x = FiLMConv(self.features, self.hidden)(x, senders, receivers)
        for _ in range(self.num_layers - 2):
            x = nn.Dropout(0.1, deterministic=not train)(x)
            x = FiLMConv(self.hidden, self.hidden)(x, senders, receivers)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        x = FiLMConv(self.hidden, self.classes, act=None)(x, senders, receivers)
        return jax.nn.log_softmax(x)


if __name__ == "__main__":
    train_node_model(Net(), epochs=100, lr=0.005)
