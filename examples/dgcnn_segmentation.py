#!/usr/bin/env python
"""DGCNN part segmentation — reference ``examples/dgcnn_segmentation.py``
(DynamicEdgeConv stack with dynamic feature-space kNN, per-point part
labels; ShapeNet raws if present, else synthetic parametric shapes whose
parts are geometric regions)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import (
    DynamicEdgeConv,
)
from examples._common import synthetic_pointclouds

B, P, K = 4, 128, 12


def load_parts():
    try:
        from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets \
            import ShapeNet

        ds = ShapeNet("data/ShapeNet", categories="Airplane",
                      split="trainval")
        clouds, labels = [], []
        rng = np.random.default_rng(0)
        for g in ds._graphs[:64]:
            pos = np.asarray(g.nodes[:, :3])
            idx = rng.integers(0, len(pos), P)
            clouds.append(pos[idx])
            labels.append(np.asarray(g.y)[idx] % 4)
        return np.stack(clouds), np.stack(labels).astype(np.int32)
    except Exception:
        clouds, shape_y = synthetic_pointclouds(num=64, points=P)
        clouds = np.stack(clouds)
        # parts = geometric regions: octant-pair of each point (4 parts)
        labels = ((clouds[..., 0] > 0).astype(np.int32) * 2
                  + (clouds[..., 2] > 0).astype(np.int32))
        return clouds, labels.astype(np.int32)


class MLP(nn.Module):
    widths: tuple

    @nn.compact
    def __call__(self, h):
        for w in self.widths[:-1]:
            h = nn.relu(nn.Dense(w)(h))
        return nn.Dense(self.widths[-1])(h)


class Net(nn.Module):
    @nn.compact
    def __call__(self, pos, batch):
        h1 = DynamicEdgeConv(MLP((64, 64)), k=K)(pos, batch=batch)
        h2 = DynamicEdgeConv(MLP((64, 64)), k=K)(h1, batch=batch)
        h = jnp.concatenate([pos, h1, h2], axis=-1)
        h = nn.relu(nn.Dense(128)(h))
        return jax.nn.log_softmax(nn.Dense(4)(h))


def main():
    clouds, labels = load_parts()
    batch = jnp.asarray(np.repeat(np.arange(B), P))
    net = Net()
    params = net.init(jax.random.PRNGKey(0),
                      jnp.asarray(clouds[:B].reshape(B * P, 3)), batch)
    tx = optax.adam(2e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, pos, yb):
        def loss(p):
            logp = net.apply(p, pos, batch)
            return -jnp.mean(jnp.take_along_axis(logp, yb[:, None], 1))
        l, grads = jax.value_and_grad(loss)(params)
        u, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), opt, l

    @jax.jit
    def n_correct(params, pos, yb):
        return jnp.sum(jnp.argmax(net.apply(params, pos, batch), -1) == yb)

    rng = np.random.default_rng(1)
    n_train = 48
    for epoch in range(1, 16):
        idx = rng.permutation(n_train)
        tot = 0.0
        for i in range(0, n_train, B):
            sel = idx[i:i + B]
            pos = jnp.asarray(clouds[sel].reshape(B * P, 3))
            yb = jnp.asarray(labels[sel].reshape(B * P))
            params, opt, l = step(params, opt, pos, yb)
            tot += float(l)
        if epoch % 5 == 0:
            correct = tot_pts = 0
            for i in range(n_train, len(clouds) - B + 1, B):
                pos = jnp.asarray(clouds[i:i + B].reshape(B * P, 3))
                yb = jnp.asarray(labels[i:i + B].reshape(B * P))
                correct += int(n_correct(params, pos, yb))
                tot_pts += B * P
            print(f"epoch {epoch:3d}  loss {tot / (n_train // B):.4f}  "
                  f"test point acc {correct / tot_pts:.4f}")


if __name__ == "__main__":
    main()
