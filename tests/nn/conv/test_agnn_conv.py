"""AGNNConv parity vs numpy (reference
``torch_geometric/nn/conv/agnn_conv.py``): α = softmax(β·cos(x_i,x_j)) over
{incoming edges ∪ analytic self loop}."""
import numpy as np

import jax
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import AGNNConv


def test_agnn_matches_numpy(small_graph):
    s, r, x = small_graph
    layer = AGNNConv()
    params = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        num_nodes=4,
    )
    got = np.asarray(
        layer.apply(params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                    num_nodes=4)
    )
    beta = float(np.asarray(params["params"]["beta"])[0])
    xn = x / np.linalg.norm(x, axis=-1, keepdims=True)
    logits = beta * (xn[s] * xn[r]).sum(-1)
    self_logit = beta  # cos(x, x) = 1

    ref = np.zeros_like(x)
    for i in range(4):
        idx = np.where(r == i)[0]
        z = np.concatenate([logits[idx], [self_logit]])
        z = np.exp(z - z.max())
        z = z / z.sum()
        for w, e in zip(z[:-1], idx):
            ref[i] += w * x[s[e]]
        ref[i] += z[-1] * x[i]
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_agnn_fixed_beta_no_param(small_graph):
    s, r, x = small_graph
    layer = AGNNConv(requires_grad=False)
    params = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        num_nodes=4,
    )
    assert "beta" not in params.get("params", {})
