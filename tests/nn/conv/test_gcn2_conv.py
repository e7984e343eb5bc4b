"""GCN2Conv (GCNII) parity vs numpy (reference
``torch_geometric/nn/conv/gcn2_conv.py``)."""
import math

import numpy as np

import jax
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import GCN2Conv


def test_gcn2_shared_weights(small_graph, dense_ahat):
    s, r, x = small_graph
    alpha, theta, lnum = 0.1, 0.5, 3
    layer = GCN2Conv(channels=8, alpha=alpha, theta=theta, layer=lnum)
    x0 = (x * 0.5).astype(np.float32)
    params = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(x0), jnp.asarray(s),
        jnp.asarray(r), num_nodes=4,
    )
    got = np.asarray(
        layer.apply(params, jnp.asarray(x), jnp.asarray(x0), jnp.asarray(s),
                    jnp.asarray(r), num_nodes=4)
    )
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    beta = math.log(theta / lnum + 1)
    Ah = dense_ahat(s, r, 4)
    h = (1 - alpha) * (Ah @ x) + alpha * x0
    ref = (1 - beta) * h + beta * (h @ p["weight1"])
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_gcn2_separate_weights(small_graph, dense_ahat):
    s, r, x = small_graph
    alpha, theta, lnum = 0.2, 1.0, 2
    layer = GCN2Conv(channels=8, alpha=alpha, theta=theta, layer=lnum,
                     shared_weights=False)
    x0 = (x[::-1].copy()).astype(np.float32)
    params = layer.init(
        jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(x0), jnp.asarray(s),
        jnp.asarray(r), num_nodes=4,
    )
    got = np.asarray(
        layer.apply(params, jnp.asarray(x), jnp.asarray(x0), jnp.asarray(s),
                    jnp.asarray(r), num_nodes=4)
    )
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    beta = math.log(theta / lnum + 1)
    Ah = dense_ahat(s, r, 4)
    h = (1 - alpha) * (Ah @ x) + alpha * x0
    support = (1 - beta) * (1 - alpha) * h + beta * (h @ p["weight1"])
    initial = (1 - beta) * alpha * x0 + beta * (x0 @ p["weight2"])
    np.testing.assert_allclose(got, support + initial, atol=1e-5)
