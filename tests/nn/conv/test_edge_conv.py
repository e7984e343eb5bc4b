"""EdgeConv parity vs numpy (reference
``torch_geometric/nn/conv/edge_conv.py``): x'_i = max_j MLP([x_i ‖ x_j−x_i])."""
import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import EdgeConv


def test_edge_conv_matches_numpy(small_graph):
    s, r, x = small_graph
    layer = EdgeConv(mlp=nn.Dense(6))
    params = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        num_nodes=4,
    )
    got = np.asarray(
        layer.apply(params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                    num_nodes=4)
    )
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    msgs = (
        np.concatenate([x[r], x[s] - x[r]], axis=-1) @ p["mlp"]["kernel"]
        + p["mlp"]["bias"]
    )
    ref = np.full((4, 6), -np.inf, np.float32)
    for e, i in enumerate(r):
        ref[i] = np.maximum(ref[i], msgs[e])
    ref[np.isneginf(ref)] = 0  # empty-segment convention: zero fill
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_edge_conv_sum_aggr(small_graph):
    s, r, x = small_graph
    layer = EdgeConv(mlp=nn.Dense(6), aggr="add")
    params = layer.init(
        jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        num_nodes=4,
    )
    got = np.asarray(
        layer.apply(params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                    num_nodes=4)
    )
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    msgs = (
        np.concatenate([x[r], x[s] - x[r]], axis=-1) @ p["mlp"]["kernel"]
        + p["mlp"]["bias"]
    )
    ref = np.zeros((4, 6), np.float32)
    np.add.at(ref, r, msgs)
    np.testing.assert_allclose(got, ref, atol=1e-5)
