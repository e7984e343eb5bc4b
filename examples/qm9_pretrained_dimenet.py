#!/usr/bin/env python
"""Pretrained-DimeNet evaluation flow — reference
``examples/qm9_pretrained_dimenet.py`` (load published per-target
DimeNet weights, evaluate MAE on the QM9 test split).  No egress: if a
checkpoint exists under ``models_ckpt/dimenet_qm9_t{T}.msgpack`` it is
loaded and only evaluated; otherwise a short pretraining run creates
it, so the load-evaluate path always runs."""
import os, sys
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
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.train.checkpoint \
    import load_checkpoint, save_checkpoint

TARGET = 7
CUTOFF = 2.0
CKPT = f"models_ckpt/dimenet_qm9_t{TARGET}.msgpack"


def synthetic_molecule(rng, n=8):
    z = rng.integers(1, 6, n).astype(np.int32)
    pos = rng.uniform(0, 2.2, (n, 3)).astype(np.float32)
    d = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    within = d < CUTOFF
    e = (np.exp(-2 * (d[within] - 1.2))
         - 2 * np.exp(-(d[within] - 1.2))).sum()
    e += 0.05 * (z * z).sum()
    return z, pos, np.float32(e)


def main():
    rng = np.random.default_rng(0)
    mols = [synthetic_molecule(rng) for _ in range(48)]
    graphs = [dimenet_graph(pos, CUTOFF, 128, 1024) for _, pos, _ in mols]
    ys = np.asarray([e for *_, e in mols], np.float32)
    mu, sd = ys[:40].mean(), ys[:40].std()
    ys = (ys - mu) / sd

    model = DimeNet(hidden_channels=32, out_channels=1, num_blocks=2,
                    num_bilinear=4, num_spherical=4, num_radial=5,
                    cutoff=CUTOFF)
    z0, pos0, _ = mols[0]
    params0 = model.init(jax.random.key(0), jnp.asarray(z0),
                         jnp.asarray(pos0), graphs[0])

    if os.path.exists(CKPT):
        params = load_checkpoint(CKPT, params0)
        print(f"loaded pretrained weights from {CKPT}")
    else:
        print(f"{CKPT} absent - pretraining once to create it")
        tx = optax.adam(1e-3)
        opt = tx.init(params0)

        @jax.jit
        def step(params, opt, z, pos, g, y):
            def loss(p):
                return (model.apply(p, z, pos, g)[0] - y) ** 2
            l, grads = jax.value_and_grad(loss)(params)
            u, opt = tx.update(grads, opt)
            return optax.apply_updates(params, u), opt, l

        params = params0
        for epoch in range(6):
            for (z, pos, _), g, y in zip(mols[:40], graphs[:40], ys[:40]):
                params, opt, _ = step(params, opt, jnp.asarray(z),
                                      jnp.asarray(pos), g, y)
        os.makedirs(os.path.dirname(CKPT), exist_ok=True)
        save_checkpoint(CKPT, params)
        print(f"saved {CKPT}")
        params = load_checkpoint(CKPT, params0)

    preds = np.asarray([
        float(model.apply(params, jnp.asarray(z), jnp.asarray(pos), g)[0])
        for (z, pos, _), g in zip(mols[40:], graphs[40:])])
    mae = float(np.mean(np.abs(preds - ys[40:]))) * float(sd)
    print(f"target {TARGET} (U0 stand-in)  test MAE: {mae:.4f}")


if __name__ == "__main__":
    main()
