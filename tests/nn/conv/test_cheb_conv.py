"""ChebConv parity vs a dense Chebyshev-recurrence reference
(``torch_geometric/nn/conv/cheb_conv.py``)."""
import numpy as np

import jax
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import ChebConv


def _lhat_dense(s, r, n, lambda_max=2.0):
    """L̂ = (2/λ)(I − D^{-1/2}AD^{-1/2}) − I as a dense matrix, with the
    framework's conventions: deg from receivers, dinv=0 for isolated nodes."""
    A = np.zeros((n, n), np.float32)
    np.add.at(A, (r, s), 1.0)
    deg = A.sum(1)
    dinv = np.where(deg > 0, 1 / np.sqrt(np.maximum(deg, 1e-12)), 0)
    An = dinv[:, None] * A * dinv[None, :]
    return (2.0 / lambda_max) * (np.eye(n, dtype=np.float32) - An) - np.eye(
        n, dtype=np.float32
    )


def test_cheb_matches_dense_recurrence(small_graph):
    s, r, x = small_graph
    K, out = 3, 6
    layer = ChebConv(8, out, K=K)
    params = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        num_nodes=4,
    )
    got = np.asarray(
        layer.apply(params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                    num_nodes=4)
    )
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    L = _lhat_dense(s, r, 4)
    tx0, tx1 = x, L @ x
    ref = tx0 @ p["weight_0"] + tx1 @ p["weight_1"]
    for k in range(2, K):
        tx2 = 2 * (L @ tx1) - tx0
        ref = ref + tx2 @ p[f"weight_{k}"]
        tx0, tx1 = tx1, tx2
    ref = ref + p["bias"]
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_cheb_k1_is_plain_linear(small_graph):
    s, r, x = small_graph
    layer = ChebConv(8, 4, K=1)
    params = layer.init(
        jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        num_nodes=4,
    )
    got = np.asarray(
        layer.apply(params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                    num_nodes=4)
    )
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    np.testing.assert_allclose(got, x @ p["weight_0"] + p["bias"], atol=1e-5)


def test_cheb_edge_weight(small_graph):
    s, r, x = small_graph
    w = np.array([0.5, 2.0, 1.0, 1.5, 0.25, 3.0], np.float32)
    layer = ChebConv(8, 4, K=2)
    params = layer.init(
        jax.random.PRNGKey(2), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        num_nodes=4, edge_weight=jnp.asarray(w),
    )
    got = np.asarray(
        layer.apply(params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                    num_nodes=4, edge_weight=jnp.asarray(w))
    )
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    A = np.zeros((4, 4), np.float32)
    np.add.at(A, (r, s), w)
    deg = A.sum(1)
    dinv = np.where(deg > 0, 1 / np.sqrt(np.maximum(deg, 1e-12)), 0)
    # λ_max = 2 ⇒ L̂ = (I − D^{-1/2}AD^{-1/2}) − I = −D^{-1/2}AD^{-1/2}
    L = -(dinv[:, None] * A * dinv[None, :]).astype(np.float32)
    ref = x @ p["weight_0"] + (L @ x) @ p["weight_1"] + p["bias"]
    np.testing.assert_allclose(got, ref, atol=1e-5)
