"""SignedConv (reference ``signed_conv.py:11-136``) parity vs numpy."""
import numpy as np

import jax
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import SignedConv


def _mean_agg(x, s, r, n):
    out = np.zeros((n, x.shape[1]))
    cnt = np.zeros(n)
    np.add.at(out, r, x[s])
    np.add.at(cnt, r, 1)
    return out / np.maximum(cnt, 1)[:, None]


def _lin(p, name, z):
    return z @ p[name]["kernel"] + p[name]["bias"]


def test_signed_first_aggr(small_graph):
    s, r, x = small_graph
    ns = np.array([3, 0], np.int32)
    nr = np.array([0, 3], np.int32)
    layer = SignedConv(8, 5, first_aggr=True)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        (jnp.asarray(s), jnp.asarray(r)),
                        (jnp.asarray(ns), jnp.asarray(nr)))
    got = np.asarray(layer.apply(params, jnp.asarray(x),
                                 (jnp.asarray(s), jnp.asarray(r)),
                                 (jnp.asarray(ns), jnp.asarray(nr))))
    assert got.shape == (4, 10)
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    ref_pos = _lin(p, "lin_pos_l", _mean_agg(x, s, r, 4)) + _lin(p, "lin_pos_r", x)
    ref_neg = _lin(p, "lin_neg_l", _mean_agg(x, ns, nr, 4)) + _lin(p, "lin_neg_r", x)
    np.testing.assert_allclose(got, np.concatenate([ref_pos, ref_neg], 1), atol=1e-5)


def test_signed_deep_aggr(small_graph):
    s, r, _ = small_graph
    ns = np.array([3, 0], np.int32)
    nr = np.array([0, 3], np.int32)
    rng = np.random.default_rng(7)
    x = rng.normal(size=(4, 12)).astype(np.float32)  # pos‖neg halves, 6 each
    layer = SignedConv(6, 5, first_aggr=False)
    args = (jnp.asarray(x), (jnp.asarray(s), jnp.asarray(r)),
            (jnp.asarray(ns), jnp.asarray(nr)))
    params = layer.init(jax.random.PRNGKey(0), *args)
    got = np.asarray(layer.apply(params, *args))
    assert got.shape == (4, 10)
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    xp, xn = x[:, :6], x[:, 6:]
    pos_part = np.concatenate(
        [_mean_agg(xp, s, r, 4), _mean_agg(xn, ns, nr, 4), xp], axis=1)
    neg_part = np.concatenate(
        [_mean_agg(xn, s, r, 4), _mean_agg(xp, ns, nr, 4), xn], axis=1)
    ref = np.concatenate(
        [_lin(p, "lin_pos_l", pos_part), _lin(p, "lin_neg_l", neg_part)], 1)
    np.testing.assert_allclose(got, ref, atol=1e-5)
