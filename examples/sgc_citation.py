#!/usr/bin/env python
"""Simplified GCN (SGC) — reference ``examples/sgc.py``: one SGConv with
K=2 propagation steps (a linear model on 2-hop-smoothed features; the K-step
propagation is folded into a single jitted layer)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import flax.linen as nn

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import SGConv
from examples._common import train_node_model


class Net(nn.Module):
    features: int = 64
    classes: int = 7

    @nn.compact
    def __call__(self, x, senders, receivers, *, train=False):
        x = SGConv(self.features, self.classes, K=2)(x, senders, receivers)
        return jax.nn.log_softmax(x)


if __name__ == "__main__":
    train_node_model(Net(), epochs=100, lr=0.2, weight_decay=5e-6)
