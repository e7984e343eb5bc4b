#!/usr/bin/env python
"""SchNet energy regression — reference ``examples/qm9_nn_conv.py`` /
``nn/models/schnet.py`` (QM9): learn a synthetic pair-potential energy from
atomic numbers + positions; checks that learning generalizes to new
molecules and that predictions stay E(3)-invariant."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.models.schnet import (
    SchNet, radius_graph_padded)

N_ATOMS, MAX_EDGES, CUTOFF = 10, 128, 4.0


def pair_energy(z, pos):
    """Ground truth: bounded species-weighted Gaussian pair potential
    (E(3)-invariant, smooth — learnable from radius-graph messages)."""
    d2 = np.sum((pos[:, None] - pos[None, :]) ** 2, axis=-1)
    np.fill_diagonal(d2, np.inf)
    w = np.sqrt(z[:, None] * z[None, :])
    e = w * np.exp(-d2 / 2.0)
    return float(e.sum() / 2)


def make_molecules(num, seed):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(num):
        z = rng.integers(1, 6, N_ATOMS).astype(np.int32)
        pos = rng.normal(size=(N_ATOMS, 3)).astype(np.float32) * 1.4
        s, r, m = radius_graph_padded(pos, cutoff=CUTOFF, max_edges=MAX_EDGES)
        out.append((z, pos, s, r, m, pair_energy(z, pos)))
    return out


def stack(mols):
    cols = list(zip(*mols))
    return [jnp.asarray(np.stack(c)) for c in cols[:5]] + [
        jnp.asarray(np.asarray(cols[5], np.float32))]


def main():
    train = stack(make_molecules(256, 0))
    test = stack(make_molecules(64, 1))
    model = SchNet(hidden_channels=64, num_filters=64, num_interactions=3,
                   num_gaussians=25, cutoff=CUTOFF)
    params = model.init(jax.random.PRNGKey(0),
                        *(a[0] for a in train[:5]))
    fwd = jax.vmap(lambda p, z, pos, s, r, m:
                   model.apply(p, z, pos, s, r, m)[0],
                   in_axes=(None, 0, 0, 0, 0, 0))
    opt = optax.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state, batch):
        def loss_fn(p):
            pred = fwd(p, *batch[:5])
            return jnp.mean((pred - batch[5]) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, state = opt.update(grads, state)
        return optax.apply_updates(params, upd), state, loss

    base = float(jnp.mean((train[5] - train[5].mean()) ** 2))
    for epoch in range(1, 151):
        params, state, loss = step(params, state, train)
        if epoch % 50 == 0:
            print(f"epoch {epoch:3d}  train MSE {float(loss):.4f} "
                  f"(variance baseline {base:.4f})")
    pred = fwd(params, *test[:5])
    mse = float(jnp.mean((pred - test[5]) ** 2))
    var = float(jnp.mean((test[5] - test[5].mean()) ** 2))
    print(f"held-out MSE {mse:.4f} vs variance {var:.4f} "
          f"(R² = {1 - mse / var:.3f})")
    assert mse < 0.5 * var

    # E(3) invariance of the trained model
    z, pos, s, r, m = (np.asarray(a[0]) for a in test[:5])
    e0 = float(model.apply(params, *map(jnp.asarray, (z, pos, s, r, m)))[0])
    th = 0.9
    rot = np.asarray([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    e1 = float(model.apply(params, *map(jnp.asarray,
                                        (z, pos @ rot.T + 3.0, s, r, m)))[0])
    print(f"rotation+translation invariance: |ΔE| = {abs(e1-e0):.2e}")


if __name__ == "__main__":
    main()
