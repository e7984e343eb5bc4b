import numpy as np
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.sddmm import (
    attention_coefficients,
    sddmm,
)


def test_sddmm_matches_dense(rng):
    n, e, f = 20, 60, 8
    q = rng.normal(size=(n, f)).astype(np.float32)
    k = rng.normal(size=(n, f)).astype(np.float32)
    s = rng.integers(0, n, e).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    scores = sddmm(jnp.asarray(q), jnp.asarray(k), jnp.asarray(s), jnp.asarray(r))
    dense = q @ k.T
    np.testing.assert_allclose(
        np.asarray(scores), dense[r, s], rtol=1e-5, atol=1e-5
    )


def test_attention_coefficients_normalize(rng):
    n, e, f = 10, 40, 4
    q = rng.normal(size=(n, f)).astype(np.float32)
    k = rng.normal(size=(n, f)).astype(np.float32)
    s = rng.integers(0, n, e).astype(np.int32)
    r = np.sort(rng.integers(0, n, e)).astype(np.int32)
    alpha = np.asarray(
        attention_coefficients(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(s), jnp.asarray(r), n,
            scale=1.0 / np.sqrt(f),
        )
    )
    sums = np.zeros(n)
    np.add.at(sums, r, alpha)
    present = np.bincount(r, minlength=n) > 0
    np.testing.assert_allclose(sums[present], 1.0, rtol=1e-5)
