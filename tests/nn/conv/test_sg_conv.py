"""SGConv parity vs numpy (reference ``torch_geometric/nn/conv/sg_conv.py``):
x' = Â^K x W with Â = D̂^{-1/2}(A+I)D̂^{-1/2}."""
import numpy as np

import jax
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import SGConv


def _dense_ahat(s, r, n, add_self_loops=True):
    A = np.zeros((n, n), np.float32)
    np.add.at(A, (r, s), 1.0)
    deg = A.sum(1) + (1.0 if add_self_loops else 0.0)
    dinv = np.where(deg > 0, 1 / np.sqrt(np.maximum(deg, 1e-12)), 0)
    if add_self_loops:
        A = A + np.eye(n, dtype=np.float32)
    return dinv[:, None] * A * dinv[None, :]


def test_sg_matches_dense(small_graph):
    s, r, x = small_graph
    layer = SGConv(8, 5, K=2)
    params = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        num_nodes=4,
    )
    got = np.asarray(
        layer.apply(params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                    num_nodes=4)
    )
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    Ah = _dense_ahat(s, r, 4)
    ref = (Ah @ (Ah @ x)) @ p["weight"] + p["bias"]
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_sg_k0_is_linear(small_graph):
    s, r, x = small_graph
    layer = SGConv(8, 5, K=0)
    params = layer.init(
        jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        num_nodes=4,
    )
    got = np.asarray(
        layer.apply(params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                    num_nodes=4)
    )
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    np.testing.assert_allclose(got, x @ p["weight"] + p["bias"], atol=1e-5)
