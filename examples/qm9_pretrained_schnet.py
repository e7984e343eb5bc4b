#!/usr/bin/env python
"""Pretrained-SchNet evaluation flow — reference
``examples/qm9_pretrained_schnet.py`` (load published per-target SchNet
weights, evaluate MAE on the QM9 test split).  No egress: if a
checkpoint exists under ``models_ckpt/schnet_qm9_t{T}.msgpack`` it is
loaded and only evaluated (the reference's flow); otherwise a short
pretraining run creates it first, so the load-evaluate path always
runs."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.models.schnet \
    import SchNet, radius_graph_padded
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.train.checkpoint \
    import load_checkpoint, save_checkpoint

TARGET = 7  # U0, the reference script's default target
N_ATOMS, CUTOFF, MAX_EDGES = 12, 3.0, 160
CKPT = f"models_ckpt/schnet_qm9_t{TARGET}.msgpack"


def make_molecules(num, seed):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(num):
        z = rng.integers(1, 6, N_ATOMS).astype(np.int32)
        pos = rng.normal(size=(N_ATOMS, 3)).astype(np.float32) * 1.4
        s, r, m = radius_graph_padded(pos, cutoff=CUTOFF,
                                      max_edges=MAX_EDGES)
        d2 = ((pos[:, None] - pos[None]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        w = np.sqrt(z[:, None] * z[None, :])
        e = float((w * np.exp(-d2 / 2.0)).sum() / 2)  # U0 stand-in
        out.append((z, pos, s, r, m, e))
    return out


def stack(mols):
    cols = list(zip(*mols))
    return [jnp.asarray(np.stack(c)) for c in cols[:5]] + [
        jnp.asarray(np.asarray(cols[5], np.float32))]


def main():
    model = SchNet(hidden_channels=64, num_filters=64,
                   num_interactions=3, num_gaussians=25, cutoff=CUTOFF)
    train = stack(make_molecules(192, 0))
    test = stack(make_molecules(64, 1))
    params0 = model.init(jax.random.PRNGKey(0),
                         *(a[0] for a in train[:5]))
    fwd = jax.vmap(lambda p, z, pos, s, r, m:
                   model.apply(p, z, pos, s, r, m)[0],
                   in_axes=(None, 0, 0, 0, 0, 0))

    if os.path.exists(CKPT):
        params = load_checkpoint(CKPT, params0)
        print(f"loaded pretrained weights from {CKPT}")
    else:
        print(f"{CKPT} absent - pretraining once to create it")
        tx = optax.adam(1e-3)
        opt = tx.init(params0)

        @jax.jit
        def step(params, opt, batch):
            def loss(p):
                return jnp.mean((fwd(p, *batch[:5]) - batch[5]) ** 2)
            l, grads = jax.value_and_grad(loss)(params)
            u, opt = tx.update(grads, opt)
            return optax.apply_updates(params, u), opt, l

        params = params0
        for epoch in range(30):
            params, opt, l = step(params, opt, train)
        os.makedirs(os.path.dirname(CKPT), exist_ok=True)
        save_checkpoint(CKPT, params)
        print(f"saved {CKPT} (final train mse {float(l):.4f})")
        params = load_checkpoint(CKPT, params0)  # exercise the load path

    pred = fwd(params, *test[:5])
    mae = float(jnp.mean(jnp.abs(pred - test[5])))
    print(f"target {TARGET} (U0 stand-in)  test MAE: {mae:.4f}")


if __name__ == "__main__":
    main()
