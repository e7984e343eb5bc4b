#!/usr/bin/env python
"""Label propagation and Correct&Smooth post-processing — reference
``examples/label_prop.py`` + ``examples/correct_and_smooth.py``: a weak MLP
base predictor, then parameter-free graph smoothing lifts its accuracy."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.models import (
    CorrectAndSmooth, LabelPropagation)
from examples._common import synthetic_planetoid


def main():
    g, masks = synthetic_planetoid()
    rng = np.random.default_rng(0)
    # make the base task hard: 4% train labels, heavy feature noise — the
    # regime where the reference shows C&S shining over a weak MLP
    tr_idx = np.nonzero(masks["train"])[0]
    masks["train"] = np.zeros_like(masks["train"])
    masks["train"][rng.choice(tr_idx, size=max(8, len(tr_idx) // 12),
                              replace=False)] = True
    noisy = np.asarray(g.nodes) + 3.0 * rng.normal(
        size=g.nodes.shape).astype(np.float32)
    x, s, r = jnp.asarray(noisy), jnp.asarray(g.senders), jnp.asarray(g.receivers)
    y = jnp.asarray(g.y)
    classes = int(np.asarray(y).max()) + 1
    y_onehot = jax.nn.one_hot(y, classes)
    train = jnp.asarray(masks["train"])
    test = jnp.asarray(masks["test"])

    def acc(pred, mask):
        return float(jnp.sum((jnp.argmax(pred, -1) == y) * mask) / mask.sum())

    # 0) pure label propagation from train labels (examples/label_prop.py)
    lp = LabelPropagation(num_layers=50, alpha=0.9)
    y_lp = lp(y_onehot * train[:, None], s, r, num_nodes=x.shape[0])
    print(f"label propagation            test acc {acc(y_lp, test):.3f}")

    # 1) weak graph-agnostic MLP base predictor
    mlp = nn.Sequential([nn.Dense(64), nn.relu, nn.Dense(classes)])
    params = mlp.init(jax.random.PRNGKey(0), x)
    opt = optax.adam(0.01)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            out = jax.nn.log_softmax(mlp.apply(p, x))
            ll = -jnp.take_along_axis(out, y[:, None], 1)[:, 0]
            return jnp.sum(ll * train) / train.sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, state = opt.update(grads, state)
        return optax.apply_updates(params, upd), state, loss

    for _ in range(100):
        params, state, _ = step(params, state)
    y_soft = jax.nn.softmax(mlp.apply(params, x))
    print(f"MLP base predictor           test acc {acc(y_soft, test):.3f}")

    # 2) Correct & Smooth on top
    cs = CorrectAndSmooth(num_correction_layers=30, correction_alpha=0.9,
                          num_smoothing_layers=30, smoothing_alpha=0.8)
    y_c = cs.correct(y_soft, y_onehot, train, s, num_nodes=x.shape[0],
                     receivers=r)
    y_cs = cs.smooth(y_c, y_onehot, train, s, num_nodes=x.shape[0],
                     receivers=r)
    print(f"MLP + Correct&Smooth         test acc {acc(y_cs, test):.3f}")


if __name__ == "__main__":
    main()
