"""GINConv / GINEConv parity vs numpy (reference
``torch_geometric/nn/conv/gin_conv.py``)."""
import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import GINConv, GINEConv


def test_gin_matches_numpy(small_graph):
    s, r, x = small_graph
    layer = GINConv(mlp=nn.Dense(6), eps=0.3)
    params = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        num_nodes=4,
    )
    got = np.asarray(
        layer.apply(params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                    num_nodes=4)
    )
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    agg = np.zeros_like(x)
    np.add.at(agg, r, x[s])
    ref = ((1 + 0.3) * x + agg) @ p["mlp"]["kernel"] + p["mlp"]["bias"]
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_gin_train_eps_is_param(small_graph):
    s, r, x = small_graph
    layer = GINConv(mlp=nn.Dense(6), eps=0.0, train_eps=True)
    params = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        num_nodes=4,
    )
    assert "eps" in params["params"]
    grads = jax.grad(
        lambda pr: layer.apply(pr, jnp.asarray(x), jnp.asarray(s),
                               jnp.asarray(r), num_nodes=4).sum()
    )(params)
    assert float(np.abs(np.asarray(grads["params"]["eps"]))) > 0


def test_gine_matches_numpy(small_graph):
    s, r, x = small_graph
    rng = np.random.default_rng(3)
    ea = rng.normal(size=(6, 4)).astype(np.float32)
    layer = GINEConv(mlp=nn.Dense(6), edge_dim=4, node_dim=8, eps=0.1)
    params = layer.init(
        jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        edge_attr=jnp.asarray(ea), num_nodes=4,
    )
    got = np.asarray(
        layer.apply(params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                    edge_attr=jnp.asarray(ea), num_nodes=4)
    )
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    e = ea @ p["Dense_0"]["kernel"] + p["Dense_0"]["bias"]   # edge proj -> node dim
    msg = np.maximum(x[s] + e, 0)
    agg = np.zeros_like(x)
    np.add.at(agg, r, msg)
    ref = ((1 + 0.1) * x + agg) @ p["mlp"]["kernel"] + p["mlp"]["bias"]
    np.testing.assert_allclose(got, ref, atol=1e-5)
