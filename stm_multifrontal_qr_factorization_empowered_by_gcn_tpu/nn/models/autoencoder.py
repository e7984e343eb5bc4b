"""GAE / VGAE / ARGVA — reference ``torch_geometric/nn/models/autoencoder.py``.

Functional-style: the encoder is any flax module; decode/recon-loss are free
functions over embeddings + COO indices (static shapes; negative edges are
sampled host-side or passed in, like the reference's
``negative_sampling``-based loss)."""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

EPS = 1e-15


def inner_product_decode(
    z: jnp.ndarray, senders: jnp.ndarray, receivers: jnp.ndarray, *, sigmoid: bool = True
) -> jnp.ndarray:
    """p(edge) = σ(z_sᵀ z_r) (reference ``InnerProductDecoder.forward``)."""
    v = jnp.sum(z[senders] * z[receivers], axis=-1)
    return jax.nn.sigmoid(v) if sigmoid else v


def recon_loss(
    z: jnp.ndarray,
    pos_senders: jnp.ndarray,
    pos_receivers: jnp.ndarray,
    neg_senders: jnp.ndarray,
    neg_receivers: jnp.ndarray,
    *,
    pos_mask: Optional[jnp.ndarray] = None,
    neg_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Binary cross-entropy on positive vs negative edges
    (reference ``GAE.recon_loss``)."""

    def _mean(vals, mask):
        if mask is None:
            return jnp.mean(vals)
        m = mask.astype(vals.dtype)
        return jnp.sum(vals * m) / jnp.maximum(jnp.sum(m), 1)

    pos = -jnp.log(inner_product_decode(z, pos_senders, pos_receivers) + EPS)
    neg = -jnp.log(1 - inner_product_decode(z, neg_senders, neg_receivers) + EPS)
    return _mean(pos, pos_mask) + _mean(neg, neg_mask)


def kl_loss(mu: jnp.ndarray, logstd: jnp.ndarray) -> jnp.ndarray:
    """KL(q(z|x) ‖ N(0, I)), averaged over nodes (reference ``VGAE.kl_loss``)."""
    logstd = jnp.clip(logstd, a_max=10)
    return -0.5 * jnp.mean(
        jnp.sum(1 + 2 * logstd - mu**2 - jnp.exp(logstd) ** 2, axis=-1)
    )


class GAE(nn.Module):
    """Graph autoencoder: any encoder module + inner-product decoder."""

    encoder: Callable

    def __call__(self, *args, **kwargs) -> jnp.ndarray:
        return self.encoder(*args, **kwargs)


class VGAE(nn.Module):
    """Variational GAE: encoder returns (mu, logstd); reparameterized sample
    during training (reference ``VGAE.encode``)."""

    encoder: Callable  # returns (mu, logstd)

    @nn.compact
    def __call__(self, *args, train: bool = False, **kwargs):
        mu, logstd = self.encoder(*args, **kwargs)
        logstd = jnp.clip(logstd, a_max=10)
        if train:
            eps = jax.random.normal(self.make_rng("reparam"), mu.shape, mu.dtype)
            z = mu + eps * jnp.exp(logstd)
        else:
            z = mu
        return z, mu, logstd


class ARGVADiscriminator(nn.Module):
    """MLP discriminator for adversarially-regularized (V)GAE — reference
    ``autoencoder.py:ARGA/ARGVA``.  Trained to tell latent codes from prior
    N(0, I) samples; the encoder's regularization loss flips the labels."""

    hidden: int = 64

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(nn.Dense(self.hidden)(z))
        h = nn.relu(nn.Dense(self.hidden)(h))
        return nn.Dense(1)(h)[..., 0]  # logits


def argva_reg_loss(disc_apply, disc_params, z: jnp.ndarray) -> jnp.ndarray:
    """Encoder side: make the discriminator call z 'real' (reference
    ``ARGA.reg_loss``)."""
    logits = disc_apply(disc_params, z)
    return -jnp.mean(jax.nn.log_sigmoid(logits))


def argva_discriminator_loss(
    disc_apply, disc_params, z: jnp.ndarray, prior: jnp.ndarray
) -> jnp.ndarray:
    """Discriminator side: prior ↦ real, z ↦ fake (reference
    ``ARGA.discriminator_loss``)."""
    real = disc_apply(disc_params, prior)
    fake = disc_apply(disc_params, jax.lax.stop_gradient(z))
    return -jnp.mean(jax.nn.log_sigmoid(real)) - jnp.mean(
        jax.nn.log_sigmoid(-fake)
    )
