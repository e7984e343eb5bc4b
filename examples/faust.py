#!/usr/bin/env python
"""FAUST shape correspondence — reference ``examples/faust.py``
(SplineConv stack over the registered template topology; target = the
template vertex id of every vertex).  Uses the FAUST dataset raws if
present, else deformed copies of a synthetic template mesh."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import SplineConv

G = 10  # template grid side -> 100 vertices


def template():
    u, v = np.meshgrid(np.linspace(0, 1, G), np.linspace(0, 1, G))
    pos = np.stack([u.ravel(), v.ravel(), 0.2 * np.sin(3 * u.ravel())],
                   axis=1).astype(np.float32)
    idx = lambda i, j: i * G + j
    s, r = [], []
    for i in range(G):
        for j in range(G):
            for di, dj in ((0, 1), (1, 0), (1, 1)):
                if i + di < G and j + dj < G:
                    a, b = idx(i, j), idx(i + di, j + dj)
                    s += [a, b]; r += [b, a]
    return pos, np.asarray(s), np.asarray(r)


def load_meshes():
    try:
        from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets \
            import FAUST

        tr = FAUST("data/FAUST", train=True)
        te = FAUST("data/FAUST", train=False)
        def unpack(ds):
            return [(np.asarray(g.nodes), np.asarray(g.senders),
                     np.asarray(g.receivers)) for g in ds._graphs]
        return unpack(tr), unpack(te)
    except Exception:
        pos0, s, r = template()
        rng = np.random.default_rng(0)
        def deform(seed):
            rg = np.random.default_rng(seed)
            a, b, c = rg.uniform(0.5, 2.0, 3)
            p = pos0 * [a, b, 1.0]
            p[:, 2] = 0.2 * np.sin(c * 3 * pos0[:, 0]) + 0.1 * rg.normal(
                size=len(pos0))
            # FAUST registrations are pose-aligned scans; keep the
            # synthetic deformations aligned too (no global rotation)
            return p.astype(np.float32), s, r
        meshes = [deform(i) for i in range(50)]
        return meshes[:40], meshes[40:]


class Net(nn.Module):
    classes: int

    @nn.compact
    def __call__(self, pos, s, r):
        pseudo = pos[s] - pos[r]  # Cartesian pseudo-coordinates
        h = jnp.ones((pos.shape[0], 1), jnp.float32)  # reference: x = 1
        for width in (32, 64, 64):
            h = jax.nn.elu(SplineConv(h.shape[-1], width, dim=3,
                                      kernel_size=5)(
                h, s, r, edge_attr=pseudo, num_nodes=pos.shape[0]))
        h = nn.relu(nn.Dense(128)(h))
        return jax.nn.log_softmax(nn.Dense(self.classes)(h))


def main():
    train, test = load_meshes()
    n = train[0][0].shape[0]
    target = jnp.arange(n)  # correspondence = vertex id
    net = Net(classes=n)
    args0 = tuple(jnp.asarray(a) for a in train[0])
    params = net.init(jax.random.PRNGKey(0), *args0)
    tx = optax.adam(2e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, pos, s, r):
        def loss(p):
            logp = net.apply(p, pos, s, r)
            return -jnp.mean(jnp.take_along_axis(logp, target[:, None], 1))
        l, grads = jax.value_and_grad(loss)(params)
        u, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), opt, l

    @jax.jit
    def acc(params, pos, s, r):
        return jnp.mean(jnp.argmax(net.apply(params, pos, s, r), -1)
                        == target)

    rng = np.random.default_rng(1)
    # STM_EX_EPOCHS: test-suite budget cap (multiple of 5 — the eval cadence)
    n_epochs = min(20, int(os.environ.get("STM_EX_EPOCHS", "20")))
    for epoch in range(1, n_epochs + 1):
        tot = 0.0
        for i in rng.permutation(len(train)):
            args = tuple(jnp.asarray(a) for a in train[i])
            params, opt, l = step(params, opt, *args)
            tot += float(l)
        if epoch % 5 == 0:
            a = np.mean([float(acc(params,
                                   *(jnp.asarray(v) for v in m)))
                         for m in test])
            print(f"epoch {epoch:3d}  loss {tot / len(train):.4f}  "
                  f"test correspondence acc {a:.4f}")


if __name__ == "__main__":
    main()
