"""LEConv parity vs numpy (reference ``torch_geometric/nn/conv/le_conv.py``):
x'_i = Θ₃x_i + Σ_j w_ij (Θ₁x_i − Θ₂x_j) — the ASAPooling scorer."""
import numpy as np

import jax
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import LEConv


def test_le_matches_numpy(small_graph):
    s, r, x = small_graph
    layer = LEConv(8, 6)
    params = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        num_nodes=4,
    )
    got = np.asarray(
        layer.apply(params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                    num_nodes=4)
    )
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    a = x @ p["lin1"]
    b = x @ p["lin2"]
    ref = x @ p["lin3"]
    for j, i in zip(s, r):
        ref[i] += a[i] - b[j]
    ref = ref + p["bias"]
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_le_edge_weight(small_graph):
    s, r, x = small_graph
    w = np.array([2.0, 0.5, 1.0, 3.0, 0.25, 1.5], np.float32)
    layer = LEConv(8, 4, use_bias=False)
    params = layer.init(
        jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        num_nodes=4, edge_weight=jnp.asarray(w),
    )
    got = np.asarray(
        layer.apply(params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                    num_nodes=4, edge_weight=jnp.asarray(w))
    )
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    a = x @ p["lin1"]
    b = x @ p["lin2"]
    ref = x @ p["lin3"]
    for e, (j, i) in enumerate(zip(s, r)):
        ref[i] += w[e] * (a[i] - b[j])
    np.testing.assert_allclose(got, ref, atol=1e-5)
