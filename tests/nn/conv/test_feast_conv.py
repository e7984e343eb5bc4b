"""FeaStConv parity vs a numpy re-derivation of the reference math
(``torch_geometric/nn/conv/feast_conv.py:91-95``)."""
import numpy as np

import jax
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import FeaStConv


def _softmax(z, axis):
    z = z - z.max(axis=axis, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=axis, keepdims=True)


def test_feast_matches_numpy(small_graph):
    s, r, x = small_graph
    heads, out = 2, 6
    layer = FeaStConv(8, out, heads=heads)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(s),
                        jnp.asarray(r), num_nodes=4)
    got = np.asarray(
        layer.apply(params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                    num_nodes=4)
    )
    assert got.shape == (4, out)

    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    W, u, c, b = p["weight"], p["u"], p["c"], p["bias"]
    # self-loops added (existing loops removed; this graph has none)
    ss = np.concatenate([s, np.arange(4)])
    rr = np.concatenate([r, np.arange(4)])
    msgs = np.zeros((len(ss), out))
    for e, (j, i) in enumerate(zip(ss, rr)):
        q = _softmax((x[j] - x[i]) @ u + c, axis=-1)          # [H]
        xj = (x[j] @ W).reshape(heads, out)
        msgs[e] = (xj * q[:, None]).sum(0)
    ref = np.zeros((4, out))
    cnt = np.zeros(4)
    np.add.at(ref, rr, msgs)
    np.add.at(cnt, rr, 1)
    ref = ref / np.maximum(cnt, 1)[:, None] + b
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_feast_self_loop_replacement(small_graph):
    # pre-existing self loops must be ignored (reference removes then re-adds)
    s, r, x = small_graph
    layer = FeaStConv(8, 4)
    s2 = np.concatenate([s, [0]]).astype(np.int32)
    r2 = np.concatenate([r, [0]]).astype(np.int32)
    params = layer.init(jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(s),
                        jnp.asarray(r), num_nodes=4)
    a = layer.apply(params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                    num_nodes=4)
    b = layer.apply(params, jnp.asarray(x), jnp.asarray(s2), jnp.asarray(r2),
                    num_nodes=4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
