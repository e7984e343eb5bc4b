"""Pallas windowed segment-sum: interpret-mode parity vs jax.ops.segment_sum
(the reference's COO==SparseTensor parity pattern, applied to kernels)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.pallas.segment import (
    CHUNK,
    segment_sum_sorted_pallas,
    spmm_coo_sorted_pallas,
)


@pytest.mark.parametrize("n,e,f", [(130, 1024, 8), (256, 2048, 16), (64, 1024, 128)])
def test_segment_sum_sorted_interpret(rng, n, e, f):
    r = np.sort(rng.integers(0, n, e)).astype(np.int32)
    msg = rng.normal(size=(e, f)).astype(np.float32)
    ref = jax.ops.segment_sum(jnp.asarray(msg), jnp.asarray(r), n)
    out = segment_sum_sorted_pallas(
        jnp.asarray(msg), jnp.asarray(r), n, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_segment_sum_skewed_interpret(rng):
    # heavy skew: half the edges hit one window
    n, e, f = 300, 2048, 8
    r = np.concatenate([
        np.zeros(e // 2, np.int32),
        np.sort(rng.integers(1, n, e - e // 2)).astype(np.int32),
    ])
    msg = rng.normal(size=(e, f)).astype(np.float32)
    ref = jax.ops.segment_sum(jnp.asarray(msg), jnp.asarray(r), n)
    out = segment_sum_sorted_pallas(jnp.asarray(msg), jnp.asarray(r), n, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_spmm_coo_sorted_pallas_interpret(rng):
    n, e, f = 100, 700, 8  # e not a multiple of CHUNK -> padding path
    s = rng.integers(0, n, e).astype(np.int32)
    r = np.sort(rng.integers(0, n, e)).astype(np.int32)
    w = rng.normal(size=e).astype(np.float32)
    x = rng.normal(size=(n, f)).astype(np.float32)
    ref = jax.ops.segment_sum(jnp.asarray(x[s] * w[:, None]), jnp.asarray(r), n)
    out = spmm_coo_sorted_pallas(
        jnp.asarray(x), jnp.asarray(s), jnp.asarray(r), n,
        edge_weight=jnp.asarray(w), interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)
