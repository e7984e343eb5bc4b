#!/usr/bin/env python
"""ARMA graph filters for node classification — reference
``examples/arma.py``: two ARMAConv blocks (3 stacks × 2 GCS layers) with
dropout between, on a citation-style graph."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import flax.linen as nn

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import ARMAConv
from examples._common import train_node_model


class Net(nn.Module):
    features: int = 64
    hidden: int = 16
    classes: int = 7

    @nn.compact
    def __call__(self, x, senders, receivers, *, train=False):
        x = ARMAConv(self.features, self.hidden, num_stacks=3, num_layers=2,
                     shared_weights=True, dropout=0.25)(
            x, senders, receivers, train=train)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = ARMAConv(self.hidden, self.classes, num_stacks=3, num_layers=2,
                     shared_weights=True, dropout=0.25)(
            x, senders, receivers, train=train)
        return jax.nn.log_softmax(x)


if __name__ == "__main__":
    train_node_model(Net(), epochs=100, lr=0.01)
