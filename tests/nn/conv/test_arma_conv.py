"""ARMAConv parity vs numpy (reference
``torch_geometric/nn/conv/arma_conv.py``)."""
import numpy as np

import jax
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import ARMAConv


def test_arma_matches_numpy(small_graph, dense_ahat):
    s, r, x = small_graph
    K, T, out = 2, 2, 6
    layer = ARMAConv(8, out, num_stacks=K, num_layers=T)
    params = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        num_nodes=4,
    )
    got = np.asarray(
        layer.apply(params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                    num_nodes=4)
    )
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    L = dense_ahat(s, r, 4, add_self_loops=False)
    outs = []
    for k in range(K):
        h = x
        for t in range(T):
            h = (L @ h) @ p[f"W_{k}_{t}"] + x @ p[f"V_{k}_{t}"] + p[f"bias_{k}_{t}"]
            if t < T - 1:
                h = np.maximum(h, 0)
        outs.append(h)
    ref = np.mean(np.stack(outs, 0), 0)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_arma_shared_weights_param_count(small_graph):
    s, r, x = small_graph
    layer = ARMAConv(8, 6, num_stacks=1, num_layers=3, shared_weights=True)
    params = layer.init(
        jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        num_nodes=4,
    )
    keys = set(params["params"].keys())
    # t=0 has its own W/V/bias; t>=1 share one set (reference arma_conv.py:62-76)
    assert keys == {"W_0_0", "V_0_0", "bias_0_0", "W_0_1", "V_0_1", "bias_0_1"}
