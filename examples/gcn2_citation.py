#!/usr/bin/env python
"""GCNII deep residual GCN — reference ``examples/gcn2_cora.py``: 8
GCN2Conv layers with initial-residual alpha=0.1 and identity-mapping
theta=0.5 (beta decays with depth), linear in/out projections."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import flax.linen as nn

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import GCN2Conv
from examples._common import train_node_model


class Net(nn.Module):
    hidden: int = 32
    classes: int = 7
    num_layers: int = 8
    alpha: float = 0.1
    theta: float = 0.5

    @nn.compact
    def __call__(self, x, senders, receivers, *, train=False):
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = x0 = nn.relu(nn.Dense(self.hidden)(x))
        for layer in range(1, self.num_layers + 1):
            h = nn.Dropout(0.5, deterministic=not train)(x)
            h = GCN2Conv(self.hidden, alpha=self.alpha, theta=self.theta,
                         layer=layer)(h, x0, senders, receivers)
            x = nn.relu(h)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Dense(self.classes)(x)
        return jax.nn.log_softmax(x)


if __name__ == "__main__":
    train_node_model(Net(), epochs=100, lr=0.01)
