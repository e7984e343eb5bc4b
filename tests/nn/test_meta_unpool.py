"""MetaLayer (reference nn/meta.py) + knn_interpolate (nn/unpool)."""
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import (
    MetaLayer,
    knn_interpolate,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.segment import (
    segment_mean,
)


def test_meta_layer_full_block(rng):
    N, E, B = 10, 24, 2
    x = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
    s = jnp.asarray(rng.integers(0, N, E))
    r = jnp.asarray(rng.integers(0, N, E))
    ea = jnp.asarray(rng.normal(size=(E, 3)).astype(np.float32))
    u = jnp.asarray(rng.normal(size=(B, 2)).astype(np.float32))
    batch = jnp.asarray(np.repeat([0, 1], 5))

    class EdgeM(nn.Module):
        @nn.compact
        def __call__(self, src, dst, ea, u, be):
            return nn.Dense(3)(jnp.concatenate([src, dst, ea, u[be]], 1))

    class NodeM(nn.Module):
        @nn.compact
        def __call__(self, x, s, r, ea, u, b):
            msg = nn.Dense(4)(jnp.concatenate([x[s], ea], 1))
            agg = segment_mean(msg, r, x.shape[0])
            return nn.Dense(4)(jnp.concatenate([x, agg, u[b]], 1))

    class GlobalM(nn.Module):
        @nn.compact
        def __call__(self, x, s, r, ea, u, b):
            return nn.Dense(2)(
                jnp.concatenate([u, segment_mean(x, b, u.shape[0])], 1))

    ml = MetaLayer(EdgeM(), NodeM(), GlobalM())
    p = ml.init(jax.random.key(0), x, s, r, ea, u, batch)
    x2, ea2, u2 = jax.jit(ml.apply)(p, x, s, r, ea, u, batch)
    assert x2.shape == (N, 4) and ea2.shape == (E, 3) and u2.shape == (B, 2)
    # edge-only variant leaves x and u untouched
    ml_e = MetaLayer(edge_model=EdgeM())
    pe = ml_e.init(jax.random.key(0), x, s, r, ea, u, batch)
    x3, ea3, u3 = ml_e.apply(pe, x, s, r, ea, u, batch)
    np.testing.assert_array_equal(np.asarray(x3), np.asarray(x))
    assert u3 is u


def test_knn_interpolate_exact_on_sources(rng):
    pos = jnp.asarray(rng.uniform(size=(15, 3)).astype(np.float32))
    feat = jnp.asarray(rng.normal(size=(15, 4)).astype(np.float32))
    # target = a source point: nearest neighbor at distance 0 dominates
    out = knn_interpolate(feat, pos, pos[:4], k=3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(feat[:4]),
                               rtol=1e-3, atol=1e-4)


def test_knn_interpolate_batch_separation(rng):
    # two clouds with different constant features; batched interpolation
    # must not leak across clouds
    pos_x = jnp.asarray(rng.uniform(size=(12, 2)).astype(np.float32))
    feat = jnp.concatenate([jnp.zeros((6, 1)), jnp.ones((6, 1))])
    bx = jnp.asarray(np.repeat([0, 1], 6))
    pos_y = jnp.asarray(rng.uniform(size=(4, 2)).astype(np.float32))
    by = jnp.asarray([0, 0, 1, 1])
    out = np.asarray(knn_interpolate(feat, pos_x, pos_y, bx, by, k=3))
    np.testing.assert_allclose(out[:2], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[2:], 1.0, rtol=1e-6)
