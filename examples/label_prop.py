#!/usr/bin/env python
"""Parameter-free label propagation — reference ``examples/label_prop.py``:
y' = alpha*Ahat*y + (1-alpha)*y iterated, seeded with the train-split
one-hot labels; no training loop at all."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.models import (
    LabelPropagation,
)
from examples._common import synthetic_planetoid


def main():
    g, masks = synthetic_planetoid()
    y = np.asarray(g.y)
    classes = int(y.max()) + 1
    onehot = jnp.asarray(np.eye(classes, dtype=np.float32)[y])

    model = LabelPropagation(num_layers=50, alpha=0.9)
    out = jax.jit(
        lambda yh, m: model(yh, jnp.asarray(g.senders), jnp.asarray(g.receivers),
                            label_mask=m, num_nodes=len(y))
    )(onehot, jnp.asarray(masks["train"]))

    pred = np.asarray(out).argmax(-1)
    for split in ("val", "test"):
        acc = float((pred[masks[split]] == y[masks[split]]).mean())
        print(f"{split} accuracy: {acc:.4f}")


if __name__ == "__main__":
    main()
