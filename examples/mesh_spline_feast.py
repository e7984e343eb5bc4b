#!/usr/bin/env python
"""Mesh segmentation with spline kernels — reference ``examples/faust.py``
(SplineConv correspondence on FAUST meshes, which need a download): a bumpy
grid mesh; each node is labeled bump/flat and classified from LOCAL
geometry only (relative-height features), with B-spline kernels over
pseudo-coordinates (normalized edge offsets).  A FeaStConv variant runs on
the same mesh for comparison (reference ``feast_conv.py`` role)."""
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
    FeaStConv, SplineConv)

G = 24  # grid side


def bumpy_mesh(seed=0):
    rng = np.random.default_rng(seed)
    u, v = np.meshgrid(np.linspace(0, 1, G), np.linspace(0, 1, G))
    z = np.zeros_like(u)
    for _ in range(6):
        cx, cy = rng.uniform(0.1, 0.9, 2)
        z += 0.25 * np.exp(-((u - cx) ** 2 + (v - cy) ** 2) / 0.01)
    y = (z > 0.12).astype(np.int32).reshape(-1)
    idx = lambda i, j: i * G + j
    s, r = [], []
    for i in range(G):
        for j in range(G):
            for di, dj in ((0, 1), (1, 0), (1, 1)):
                if i + di < G and j + dj < G:
                    a, b = idx(i, j), idx(i + di, j + dj)
                    s += [a, b]; r += [b, a]
    s, r = np.asarray(s), np.asarray(r)
    pos = np.stack([u.reshape(-1), v.reshape(-1), z.reshape(-1)], 1).astype(np.float32)
    # local features only: height relative to neighbor mean (no absolute z)
    nbr_mean = np.zeros(G * G)
    deg = np.zeros(G * G)
    np.add.at(nbr_mean, r, pos[s, 2]); np.add.at(deg, r, 1)
    feat = (pos[:, 2] - nbr_mean / np.maximum(deg, 1))[:, None].astype(np.float32)
    # pseudo-coordinates: normalized (du, dv) offsets in [0, 1]^2
    pseudo = ((pos[s, :2] - pos[r, :2]) * (G - 1) / 2 + 0.5).astype(np.float32)
    return pos, feat, s, r, pseudo, y


class SplineNet(nn.Module):
    @nn.compact
    def __call__(self, x, s, r, pseudo):
        h = jax.nn.elu(SplineConv(x.shape[-1], 32, dim=2, kernel_size=5)(
            x, s, r, edge_attr=pseudo, num_nodes=x.shape[0]))
        h = jax.nn.elu(SplineConv(32, 32, dim=2, kernel_size=5)(
            h, s, r, edge_attr=pseudo, num_nodes=x.shape[0]))
        return jax.nn.log_softmax(nn.Dense(2)(h))


class FeaStNet(nn.Module):
    @nn.compact
    def __call__(self, x, s, r, pseudo):
        h = jax.nn.elu(FeaStConv(x.shape[-1], 32, heads=4)(
            x, s, r, num_nodes=x.shape[0]))
        h = jax.nn.elu(FeaStConv(32, 32, heads=4)(
            h, s, r, num_nodes=x.shape[0]))
        return jax.nn.log_softmax(nn.Dense(2)(h))


def run(net, name, feat, s, r, pseudo, y, train_mask):
    x = jnp.asarray(feat)
    sj, rj, pj = jnp.asarray(s), jnp.asarray(r), jnp.asarray(pseudo)
    yj = jnp.asarray(y)
    tm = jnp.asarray(train_mask)
    params = net.init(jax.random.PRNGKey(0), x, sj, rj, pj)
    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            out = net.apply(p, x, sj, rj, pj)
            ll = -jnp.take_along_axis(out, yj[:, None], 1)[:, 0]
            return jnp.sum(ll * tm) / tm.sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, state = opt.update(grads, state)
        return optax.apply_updates(params, upd), state, loss

    for _ in range(150):
        params, state, loss = step(params, state)
    pred = np.asarray(jnp.argmax(net.apply(params, x, sj, rj, pj), -1))
    acc = (pred[~train_mask] == y[~train_mask]).mean()
    print(f"{name:10s} held-out accuracy: {acc:.4f} (loss {float(loss):.4f})")


def main():
    pos, feat, s, r, pseudo, y = bumpy_mesh()
    rng = np.random.default_rng(1)
    train_mask = rng.random(G * G) < 0.5
    run(SplineNet(), "SplineConv", feat, s, r, pseudo, y, train_mask)
    run(FeaStNet(), "FeaStConv", feat, s, r, pseudo, y, train_mask)


if __name__ == "__main__":
    main()
