#!/usr/bin/env python
"""DimeNet on synthetic molecules — reference ``examples/qm9_*dimenet.py``
(QM9 there; synthetic bond-energy targets here, no egress).  The target is a
rotation-invariant function of distances and angles, exactly DimeNet's
inductive bias."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.models import (
    DimeNet,
    dimenet_graph,
)

CUTOFF = 2.0


def synthetic_molecule(rng, n=8):
    z = rng.integers(1, 9, n).astype(np.int32)
    pos = rng.uniform(0, 2.2, (n, 3)).astype(np.float32)
    d = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    within = d < CUTOFF
    # invariant target: sum of Morse-like pair energies weighted by charges
    e = (np.exp(-2 * (d[within] - 1.2)) - 2 * np.exp(-(d[within] - 1.2))).sum()
    e += 0.05 * (z * z).sum()
    return z, pos, np.float32(e)


def main():
    rng = np.random.default_rng(0)
    mols = [synthetic_molecule(rng) for _ in range(64)]
    graphs = [dimenet_graph(pos, CUTOFF, 128, 1024) for _, pos, _ in mols]
    ys = np.asarray([e for *_, e in mols])
    ys = (ys - ys.mean()) / ys.std()

    model = DimeNet(hidden_channels=32, out_channels=1, num_blocks=2,
                    num_bilinear=4, num_spherical=4, num_radial=5,
                    cutoff=CUTOFF)
    z0, pos0, _ = mols[0]
    params = model.init(jax.random.key(0), jnp.asarray(z0),
                        jnp.asarray(pos0), graphs[0])
    tx = optax.adam(1e-3); opt = tx.init(params)

    @jax.jit
    def step(params, opt, z, pos, g, y):
        def loss_fn(p):
            out = model.apply(p, z, pos, g)
            return (out[0] - y) ** 2
        l, gr = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(gr, opt)
        return optax.apply_updates(params, u), opt, l

    t0 = time.time()
    for epoch in range(8):
        tot = 0.0
        for (z, pos, _), g, y in zip(mols, graphs, ys):
            params, opt, l = step(params, opt, jnp.asarray(z),
                                  jnp.asarray(pos), g, y)
            tot += float(l)
        print(f"epoch {epoch}: mse={tot / len(mols):.4f}")
    print(f"done in {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
