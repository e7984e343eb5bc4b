"""NNConv (edge-conditioned conv) parity vs numpy (reference
``torch_geometric/nn/conv/nn_conv.py``): x'_i = x_i W_root + Σ_j x_j·MLP(e_ji)."""
import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import NNConv


def test_nn_conv_matches_numpy(small_graph):
    s, r, x = small_graph
    rng = np.random.default_rng(7)
    ea = rng.normal(size=(6, 4)).astype(np.float32)
    layer = NNConv(8, 6, edge_mlp=nn.Dense(48))
    params = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        edge_attr=jnp.asarray(ea), num_nodes=4,
    )
    got = np.asarray(
        layer.apply(params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                    edge_attr=jnp.asarray(ea), num_nodes=4)
    )
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    theta = (ea @ p["edge_mlp"]["kernel"] + p["edge_mlp"]["bias"]).reshape(6, 8, 6)
    ref = x @ p["root"] + p["bias"]
    for e, (j, i) in enumerate(zip(s, r)):
        ref[i] += x[j] @ theta[e]
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_nn_conv_mean_aggr_no_root(small_graph):
    s, r, x = small_graph
    rng = np.random.default_rng(8)
    ea = rng.normal(size=(6, 4)).astype(np.float32)
    layer = NNConv(8, 3, edge_mlp=nn.Dense(24), aggr="mean",
                   root_weight=False, use_bias=False)
    params = layer.init(
        jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        edge_attr=jnp.asarray(ea), num_nodes=4,
    )
    got = np.asarray(
        layer.apply(params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                    edge_attr=jnp.asarray(ea), num_nodes=4)
    )
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    theta = (ea @ p["edge_mlp"]["kernel"] + p["edge_mlp"]["bias"]).reshape(6, 8, 3)
    ref = np.zeros((4, 3), np.float32)
    cnt = np.zeros(4)
    for e, (j, i) in enumerate(zip(s, r)):
        ref[i] += x[j] @ theta[e]
        cnt[i] += 1
    ref = ref / np.maximum(cnt, 1)[:, None]
    np.testing.assert_allclose(got, ref, atol=1e-5)
