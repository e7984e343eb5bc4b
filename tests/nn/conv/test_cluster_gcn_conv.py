"""ClusterGCNConv parity vs numpy (reference
``torch_geometric/nn/conv/cluster_gcn_conv.py``):
x' = (Â + λ·diag(Â)) x W₁ + x W₂, Â = D̂^{-1}(A+I)."""
import numpy as np

import jax
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import ClusterGCNConv


def test_cluster_gcn_matches_dense(small_graph):
    s, r, x = small_graph
    lam = 0.3
    layer = ClusterGCNConv(8, 6, diag_lambda=lam)
    params = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        num_nodes=4,
    )
    got = np.asarray(
        layer.apply(params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                    num_nodes=4)
    )
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    A = np.zeros((4, 4), np.float32)
    np.add.at(A, (r, s), 1.0)
    deg = A.sum(1) + 1.0
    Ah = (A + np.eye(4, dtype=np.float32)) / deg[:, None]
    # diagonal amplified by (1+λ) ⇒ add λ·diag(Â)
    Ah = Ah + lam * np.diag(np.diag(Ah))
    ref = (Ah @ x) @ p["lin_out"] + x @ p["lin_root"] + p["bias"]
    np.testing.assert_allclose(got, ref, atol=1e-5)
