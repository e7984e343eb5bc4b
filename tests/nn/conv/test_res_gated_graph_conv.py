"""ResGatedGraphConv parity vs numpy (reference
``torch_geometric/nn/conv/res_gated_graph_conv.py``):
x'_i = W_skip x_i + Σ_j σ(K x_i + Q x_j) ⊙ V x_j."""
import numpy as np

import jax
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import ResGatedGraphConv


def _sigmoid(z):
    return 1 / (1 + np.exp(-z))


def test_res_gated_matches_numpy(small_graph):
    s, r, x = small_graph
    layer = ResGatedGraphConv(8, 6)
    params = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        num_nodes=4,
    )
    got = np.asarray(
        layer.apply(params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                    num_nodes=4)
    )
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    k = x @ p["lin_key"]
    q = x @ p["lin_query"]
    v = x @ p["lin_value"]
    ref = x @ p["lin_skip"] + p["bias"]
    for j, i in zip(s, r):
        ref[i] += _sigmoid(k[i] + q[j]) * v[j]
    np.testing.assert_allclose(got, ref, atol=1e-5)
