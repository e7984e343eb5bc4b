"""FiLMConv (reference ``film_conv.py:14-143``) parity vs numpy."""
import numpy as np

import jax
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import FiLMConv


def _relu(z):
    return np.maximum(z, 0)


def test_film_single_relation(small_graph):
    s, r, x = small_graph
    layer = FiLMConv(8, 5)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(s),
                        jnp.asarray(r), num_nodes=4)
    got = np.asarray(layer.apply(params, jnp.asarray(x), jnp.asarray(s),
                                 jnp.asarray(r), num_nodes=4))
    assert got.shape == (4, 5)
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    bg = x @ p["film_skip"]["kernel"]
    beta_s, gamma_s = bg[:, :5], bg[:, 5:]
    ref = _relu(gamma_s * (x @ p["lin_skip"]["kernel"]) + beta_s)
    bgr = x @ p["film_0"]["kernel"] + p["film_0"]["bias"]
    beta, gamma = bgr[:, :5], bgr[:, 5:]
    xr = x @ p["lin_0"]["kernel"]
    agg = np.zeros((4, 5))
    cnt = np.zeros(4)
    for e in range(len(s)):
        agg[r[e]] += _relu(gamma[r[e]] * xr[s[e]] + beta[r[e]])
        cnt[r[e]] += 1
    ref = ref + agg / np.maximum(cnt, 1)[:, None]
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_film_multi_relation_masks(small_graph):
    s, r, x = small_graph
    et = np.array([0, 1, 0, 1, 0, 1], np.int32)
    layer = FiLMConv(8, 4, num_relations=2)
    params = layer.init(jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(s),
                        jnp.asarray(r), edge_type=jnp.asarray(et), num_nodes=4)
    out = layer.apply(params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                      edge_type=jnp.asarray(et), num_nodes=4)
    assert out.shape == (4, 4)
    # relation masks: flipping an edge's type changes the result
    et2 = et.copy()
    et2[0] = 1
    out2 = layer.apply(params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                       edge_type=jnp.asarray(et2), num_nodes=4)
    assert not np.allclose(np.asarray(out), np.asarray(out2))
