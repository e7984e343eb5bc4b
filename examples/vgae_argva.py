#!/usr/bin/env python
"""Variational and adversarially-regularized graph autoencoders — reference
``examples/autoencoder.py`` / ``examples/argva_node_clustering.py``:
VGAE (reparameterized latents + KL) and ARGVA (a discriminator pushes the
aggregated posterior toward N(0, I)) on link prediction."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import GCNConv
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.models.autoencoder import (
    VGAE, ARGVADiscriminator, argva_reg_loss, argva_discriminator_loss)
from examples._common import synthetic_planetoid

LATENT = 16


class Encoder(nn.Module):
    in_dim: int

    @nn.compact
    def __call__(self, x, s, r):
        h = nn.relu(GCNConv(self.in_dim, 32)(x, s, r, num_nodes=x.shape[0]))
        mu = GCNConv(32, LATENT)(h, s, r, num_nodes=x.shape[0])
        logstd = GCNConv(32, LATENT)(h, s, r, num_nodes=x.shape[0])
        return mu, logstd


def recon_loss(z, s, r, neg_s, neg_r):
    pos = jnp.sum(z[s] * z[r], -1)
    neg = jnp.sum(z[neg_s] * z[neg_r], -1)
    return (-jnp.mean(jax.nn.log_sigmoid(pos))
            - jnp.mean(jax.nn.log_sigmoid(-neg)))


def auc(z, pos, neg):
    sp = np.sum(z[pos[0]] * z[pos[1]], -1)
    sn = np.sum(z[neg[0]] * z[neg[1]], -1)
    return float((sp[:, None] > sn[None, :]).mean())


def main():
    g, _ = synthetic_planetoid(n=300, f=32)
    rng = np.random.default_rng(0)
    ei = np.stack([np.asarray(g.senders), np.asarray(g.receivers)])
    perm = rng.permutation(ei.shape[1])
    cut = int(0.85 * len(perm))
    train_ei, test_pos = ei[:, perm[:cut]], ei[:, perm[cut:]]
    n = g.nodes.shape[0]
    test_neg = rng.integers(0, n, test_pos.shape)

    x = jnp.asarray(g.nodes)
    s, r = jnp.asarray(train_ei[0]), jnp.asarray(train_ei[1])
    model = VGAE(Encoder(32))
    disc = ARGVADiscriminator()

    params = model.init({"params": jax.random.PRNGKey(0),
                         "reparam": jax.random.PRNGKey(1)}, x, s, r,
                        train=True)
    dparams = disc.init(jax.random.PRNGKey(2), jnp.zeros((4, LATENT)))
    opt, dopt = optax.adam(5e-3), optax.adam(5e-3)
    state, dstate = opt.init(params), dopt.init(dparams)

    @jax.jit
    def step(params, dparams, state, dstate, key):
        k1, k2, k3 = jax.random.split(key, 3)
        neg = jax.random.randint(k1, (2, s.shape[0]), 0, n)

        def loss_fn(p):
            z, mu, logstd = model.apply(p, x, s, r, train=True,
                                        rngs={"reparam": k2})
            rec = recon_loss(z, s, r, neg[0], neg[1])
            kl = -0.5 / n * jnp.mean(jnp.sum(
                1 + 2 * logstd - mu**2 - jnp.exp(logstd)**2, -1))
            reg = argva_reg_loss(disc.apply, dparams, z)
            return rec + kl + 0.5 * reg, z

        (loss, z), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, state = opt.update(grads, state)
        params = optax.apply_updates(params, upd)

        prior = jax.random.normal(k3, z.shape)
        dloss, dgrads = jax.value_and_grad(
            lambda dp: argva_discriminator_loss(disc.apply, dp, z, prior)
        )(dparams)
        dupd, dstate = dopt.update(dgrads, dstate)
        return params, optax.apply_updates(dparams, dupd), state, dstate, loss

    key = jax.random.PRNGKey(4)
    for epoch in range(1, 201):
        key, k = jax.random.split(key)
        params, dparams, state, dstate, loss = step(
            params, dparams, state, dstate, k)
        if epoch % 50 == 0:
            print(f"epoch {epoch:3d}  ARGVA loss {float(loss):.4f}")

    z, _, _ = model.apply(params, x, s, r, train=False)
    z = np.asarray(z)
    score = auc(z, test_pos, test_neg)
    print(f"held-out link-prediction AUC: {score:.3f}")
    # aggregated posterior should look like the prior (discriminator fooled)
    logits = np.asarray(disc.apply(dparams, jnp.asarray(z)))
    print(f"discriminator mean P(real|z) = "
          f"{float(jax.nn.sigmoid(logits).mean()):.3f} "
          f"(0.5 would mean the posterior is indistinguishable from the prior)")
    assert score > 0.85


if __name__ == "__main__":
    main()
