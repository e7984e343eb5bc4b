"""GravNetConv (reference ``gravnet_conv.py``) parity vs numpy."""
import numpy as np

import jax
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import GravNetConv


def test_gravnet_matches_numpy():
    rng = np.random.default_rng(0)
    n, f = 12, 8
    x = rng.normal(size=(n, f)).astype(np.float32)
    k = 3
    layer = GravNetConv(f, 10, space_dimensions=2, propagate_dimensions=4, k=k)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(layer.apply(params, jnp.asarray(x)))
    assert got.shape == (n, 10)

    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    sl = x @ p["lin_s"]["kernel"] + p["lin_s"]["bias"]
    hl = x @ p["lin_h"]["kernel"] + p["lin_h"]["bias"]
    d = ((sl[:, None, :] - sl[None, :, :]) ** 2).sum(-1)   # [n, n]
    ref = np.zeros((n, 10))
    feats = np.zeros((n, 8))
    for i in range(n):
        nbr = np.argsort(d[i], kind="stable")[:k]
        w = np.exp(-10.0 * d[i, nbr])
        msgs = hl[nbr] * w[:, None]
        feats[i] = np.concatenate([msgs.mean(0), msgs.max(0)])
    cat = np.concatenate([feats, x], axis=1)
    ref = cat @ p["lin"]["kernel"] + p["lin"]["bias"]
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_gravnet_batch_separation():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(10, 4)).astype(np.float32)
    batch = jnp.asarray(np.array([0] * 5 + [1] * 5, np.int32))
    layer = GravNetConv(4, 6, space_dimensions=2, propagate_dimensions=3, k=2)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), batch)
    # graph 1's output must not change when graph 0's features change
    out_a = np.asarray(layer.apply(params, jnp.asarray(x), batch))
    x2 = x.copy()
    x2[:5] += 10.0
    out_b = np.asarray(layer.apply(params, jnp.asarray(x2), batch))
    np.testing.assert_allclose(out_a[5:], out_b[5:], atol=1e-5)
    assert not np.allclose(out_a[:5], out_b[:5])
