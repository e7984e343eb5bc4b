"""Segment-op tests: padded vs unpadded equivalence, jit parity, dense oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops import (
    aggregate,
    gcn_norm,
    segment_max,
    segment_mean,
    segment_min,
    segment_softmax,
    segment_sum,
    spmm_coo,
    spmm_dense,
)


@pytest.fixture
def data(rng):
    ids = jnp.asarray(rng.integers(0, 5, size=40))
    x = jnp.asarray(rng.normal(size=(40, 8)).astype(np.float32))
    return x, ids


def test_segment_sum_matches_numpy(data):
    x, ids = data
    out = segment_sum(x, ids, 5)
    ref = np.zeros((5, 8), np.float32)
    np.add.at(ref, np.asarray(ids), np.asarray(x))
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_segment_mean_empty_segment():
    x = jnp.ones((3, 2))
    ids = jnp.array([0, 0, 2])
    out = segment_mean(x, ids, 4)
    np.testing.assert_allclose(out[1], 0.0)
    np.testing.assert_allclose(out[3], 0.0)
    np.testing.assert_allclose(out[0], 1.0)


def test_segment_max_empty_is_zero():
    x = jnp.array([[-5.0], [-3.0]])
    ids = jnp.array([1, 1])
    out = segment_max(x, ids, 3)
    np.testing.assert_allclose(out[0], 0.0)   # empty → 0, torch_scatter semantics
    np.testing.assert_allclose(out[1], -3.0)  # all-negative segment keeps true max
    np.testing.assert_allclose(out[2], 0.0)


def test_segment_min_all_positive():
    x = jnp.array([[5.0], [3.0]])
    out = segment_min(x, jnp.array([0, 0]), 2)
    np.testing.assert_allclose(out[0], 3.0)


def test_mask_equals_slicing(data, rng):
    x, ids = data
    mask = jnp.asarray(rng.random(40) > 0.3)
    for aggr in ["add", "mean", "max", "min"]:
        masked = aggregate(aggr, x, ids, 5, mask=mask)
        sliced = aggregate(aggr, x[mask], ids[mask], 5)
        np.testing.assert_allclose(masked, sliced, rtol=1e-6, atol=1e-6)


def test_segment_softmax(data):
    x, ids = data
    out = segment_softmax(x, ids, 5)
    sums = segment_sum(out, ids, 5)
    np.testing.assert_allclose(sums, np.ones((5, 8)), rtol=1e-5)
    # stability with large values
    big = segment_softmax(x * 1e4, ids, 5)
    assert bool(jnp.all(jnp.isfinite(big)))


def test_jit_parity(data):
    x, ids = data
    f = jax.jit(lambda x, i: segment_sum(x, i, 5))
    np.testing.assert_allclose(f(x, ids), segment_sum(x, ids, 5), rtol=1e-6)


def test_spmm_coo_vs_dense(rng):
    n, e, f = 13, 50, 6
    s = jnp.asarray(rng.integers(0, n, e))
    r = jnp.asarray(rng.integers(0, n, e))
    w = jnp.asarray(rng.normal(size=e).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    a = spmm_coo(x, s, r, n, edge_weight=w)
    b = spmm_dense(x, s, r, n, edge_weight=w)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_gcn_norm_matches_dense_reference(rng):
    """edge_norm + analytic self term ≡ dense D̂^-1/2 (A+I) D̂^-1/2."""
    n, e = 9, 30
    s = jnp.asarray(rng.integers(0, n, e))
    r = jnp.asarray(rng.integers(0, n, e))
    x = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))

    edge_norm, self_norm = gcn_norm(s, r, n)
    out = spmm_coo(x, s, r, n, edge_weight=edge_norm) + self_norm[:, None] * x

    A = np.zeros((n, n), np.float32)
    np.add.at(A, (np.asarray(r), np.asarray(s)), 1.0)
    A = A + np.eye(n, dtype=np.float32)
    d = A.sum(axis=1)
    Dinv = np.diag(d ** -0.5)
    ref = Dinv @ A @ Dinv @ np.asarray(x)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_gradients_flow_through_segments(data):
    x, ids = data

    def loss(x):
        return jnp.sum(segment_sum(x, ids, 5) ** 2)

    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    assert bool(jnp.any(g != 0))
