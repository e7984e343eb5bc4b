"""TransformerConv (UniMP) parity vs numpy (reference
``torch_geometric/nn/conv/transformer_conv.py``)."""
import math

import numpy as np

import jax
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import TransformerConv


def _seg_softmax(logits, r, n):
    out = np.zeros_like(logits)
    for i in range(n):
        idx = np.where(r == i)[0]
        if len(idx) == 0:
            continue
        for h in range(logits.shape[1]):
            z = np.exp(logits[idx, h] - logits[idx, h].max())
            out[idx, h] = z / z.sum()
    return out


def test_transformer_with_edge_attr(small_graph):
    s, r, x = small_graph
    heads, out = 2, 6
    rng = np.random.default_rng(5)
    ea = rng.normal(size=(6, 4)).astype(np.float32)
    layer = TransformerConv(8, out, heads=heads, edge_dim=4)
    params = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        edge_attr=jnp.asarray(ea), num_nodes=4,
    )
    got = np.asarray(
        layer.apply(params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                    edge_attr=jnp.asarray(ea), num_nodes=4)
    )
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    key = (x @ p["lin_key"]).reshape(4, heads, out)
    query = (x @ p["lin_query"]).reshape(4, heads, out)
    value = (x @ p["lin_value"]).reshape(4, heads, out)
    e = (ea @ p["lin_edge"]).reshape(6, heads, out)

    key_j = key[s] + e
    val_j = value[s] + e
    logits = (query[r] * key_j).sum(-1) / math.sqrt(out)   # [E, H]
    alpha = _seg_softmax(logits, r, 4)

    agg = np.zeros((4, heads, out), np.float32)
    for ei, i in enumerate(r):
        agg[i] += alpha[ei][:, None] * val_j[ei]
    ref = agg.reshape(4, heads * out) + x @ p["lin_skip"] + p["skip_bias"]
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_transformer_beta_gate(small_graph):
    s, r, x = small_graph
    layer = TransformerConv(8, 6, heads=1, beta=True)
    params = layer.init(
        jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        num_nodes=4,
    )
    got = np.asarray(
        layer.apply(params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                    num_nodes=4)
    )
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    key = x @ p["lin_key"]
    query = x @ p["lin_query"]
    value = x @ p["lin_value"]
    logits = (query[r] * key[s]).sum(-1, keepdims=True) / math.sqrt(6)
    alpha = _seg_softmax(logits, r, 4)
    agg = np.zeros((4, 6), np.float32)
    for ei, i in enumerate(r):
        agg[i] += alpha[ei, 0] * value[s[ei]]
    x_r = x @ p["lin_skip"] + p["skip_bias"]
    b = 1 / (1 + np.exp(-(np.concatenate([agg, x_r, agg - x_r], -1) @ p["lin_beta"])))
    ref = b * x_r + (1 - b) * agg
    np.testing.assert_allclose(got, ref, atol=1e-5)
