#!/usr/bin/env python
"""PointNet++ part segmentation — reference
``examples/pointnet2_segmentation.py``: set-abstraction (fps downsample +
radius grouping + PointNetConv) then a feature-propagation decoder
(knn_interpolate upsampling), per-point labels.  Synthetic task: label each
point of a two-part shape (sphere with a protruding spike)."""
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
    PointNetConv, knn_interpolate)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.pool import fps, radius

P, M, R = 128, 32, 0.6  # points, fps samples, grouping radius


def make_shape(seed):
    rng = np.random.default_rng(seed)
    n_spike = P // 4
    v = rng.normal(size=(P - n_spike, 3))
    sphere = v / np.linalg.norm(v, axis=1, keepdims=True)
    t = rng.uniform(1.1, 2.0, size=(n_spike, 1))
    axis = np.asarray([[1.0, 0, 0]]) @ random_rot(rng)
    spike = t * axis + 0.05 * rng.normal(size=(n_spike, 3))
    pos = np.concatenate([sphere, spike]).astype(np.float32)
    y = np.concatenate([np.zeros(P - n_spike), np.ones(n_spike)]).astype(np.int32)
    perm = rng.permutation(P)
    return pos[perm], y[perm]


def random_rot(rng):
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    return q.astype(np.float32)


class LocalMLP(nn.Module):
    width: int

    @nn.compact
    def __call__(self, h):
        return nn.Dense(self.width)(nn.relu(nn.Dense(self.width)(h)))


class Net(nn.Module):
    classes: int = 2

    @nn.compact
    def __call__(self, pos):
        # --- set abstraction: fps centers + radius grouping ---------------
        centers = fps(pos, num_samples=M)
        cpos = pos[centers]
        src, dst, valid = radius(pos, cpos, R, max_num_neighbors=16)
        h1 = PointNetConv(local_nn=LocalMLP(32), add_self_loops=False)(
            (None, None), (pos, cpos), src, dst,
            num_nodes=M, edge_mask=valid)
        h1 = nn.relu(h1)                                   # [M, 32]
        # global context appended to every center
        g = jnp.max(h1, axis=0, keepdims=True)
        h1 = jnp.concatenate([h1, jnp.broadcast_to(g, (M, g.shape[1]))], -1)
        # --- feature propagation: interpolate back to all points ----------
        up = knn_interpolate(h1, cpos, pos, k=3)           # [P, 64]
        h = jnp.concatenate([up, pos], axis=-1)
        h = nn.relu(nn.Dense(64)(h))
        return jax.nn.log_softmax(nn.Dense(self.classes)(h))


def main():
    shapes = [make_shape(i) for i in range(40)]
    net = Net()
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(shapes[0][0]))
    opt = optax.adam(2e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state, pos, y):
        def loss_fn(p):
            out = net.apply(p, pos)
            return -jnp.mean(jnp.take_along_axis(out, y[:, None], 1))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, state = opt.update(grads, state)
        return optax.apply_updates(params, upd), state, loss

    @jax.jit
    def acc(params, pos, y):
        return jnp.mean(jnp.argmax(net.apply(params, pos), -1) == y)

    rng = np.random.default_rng(1)
    n_train = 30
    for epoch in range(1, 16):
        tot = 0.0
        for j in rng.permutation(n_train):
            pos, y = shapes[j]
            params, state, loss = step(params, state, jnp.asarray(pos),
                                       jnp.asarray(y))
            tot += float(loss)
        if epoch % 5 == 0:
            a = np.mean([float(acc(params, jnp.asarray(p), jnp.asarray(y)))
                         for p, y in shapes[n_train:]])
            print(f"epoch {epoch:3d}  loss {tot:.3f}  test point-acc {a:.4f}")


if __name__ == "__main__":
    main()
