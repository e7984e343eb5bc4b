"""APPNP parity vs numpy (reference ``torch_geometric/nn/conv/appnp.py``):
h^{k+1} = (1−α)Âh^k + αx."""
import numpy as np

import jax
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import APPNP


def test_appnp_matches_dense(small_graph, dense_ahat):
    s, r, x = small_graph
    K, alpha = 4, 0.15
    layer = APPNP(K=K, alpha=alpha)
    params = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        num_nodes=4,
    )
    got = np.asarray(
        layer.apply(params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                    num_nodes=4)
    )
    Ah = dense_ahat(s, r, 4)
    h = x.copy()
    for _ in range(K):
        h = (1 - alpha) * (Ah @ h) + alpha * x
    np.testing.assert_allclose(got, h, atol=1e-5)


def test_appnp_k0_identity(small_graph, dense_ahat):
    s, r, x = small_graph
    layer = APPNP(K=0, alpha=0.1)
    params = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        num_nodes=4,
    )
    got = np.asarray(
        layer.apply(params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                    num_nodes=4)
    )
    np.testing.assert_allclose(got, x, atol=1e-6)


def test_appnp_converges_to_ppr(small_graph, dense_ahat):
    """With large K the iteration approaches the personalized-PageRank fixed
    point h* = α(I − (1−α)Â)^{-1} x."""
    s, r, x = small_graph
    alpha = 0.2
    layer = APPNP(K=60, alpha=alpha)
    params = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        num_nodes=4,
    )
    got = np.asarray(
        layer.apply(params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                    num_nodes=4)
    )
    Ah = dense_ahat(s, r, 4)
    fixed = alpha * np.linalg.solve(np.eye(4) - (1 - alpha) * Ah, x)
    np.testing.assert_allclose(got, fixed, atol=1e-4)
