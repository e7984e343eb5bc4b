"""TAGConv parity vs numpy (reference ``torch_geometric/nn/conv/tag_conv.py``):
x' = Σ_{k=0..K} Â^k x W_k with Â = D^{-1/2}AD^{-1/2} (no self loops)."""
import numpy as np

import jax
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import TAGConv


def test_tag_matches_dense(small_graph, dense_ahat):
    s, r, x = small_graph
    K = 3
    layer = TAGConv(8, 6, K=K)
    params = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        num_nodes=4,
    )
    got = np.asarray(
        layer.apply(params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                    num_nodes=4)
    )
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    Ah = dense_ahat(s, r, 4, add_self_loops=False)
    h, ref = x, x @ p["weight_0"]
    for k in range(1, K + 1):
        h = Ah @ h
        ref = ref + h @ p[f"weight_{k}"]
    ref = ref + p["bias"]
    np.testing.assert_allclose(got, ref, atol=1e-5)
