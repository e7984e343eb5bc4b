"""GMMConv parity vs numpy (reference ``gmm_conv.py:124-151``)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import GMMConv

EPS = 1e-15


def test_gmm_matches_numpy(small_graph):
    s, r, x = small_graph
    rng = np.random.default_rng(2)
    pseudo = rng.uniform(size=(len(s), 3)).astype(np.float32)
    K, M = 4, 5
    layer = GMMConv(8, M, dim=3, kernel_size=K)
    params = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        edge_attr=jnp.asarray(pseudo), num_nodes=4,
    )
    got = np.asarray(layer.apply(
        params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        edge_attr=jnp.asarray(pseudo), num_nodes=4,
    ))
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    g, mu, sig, root, b = p["g"], p["mu"], p["sigma"], p["root"], p["bias"]
    msgs = np.zeros((len(s), M))
    for e in range(len(s)):
        gauss = np.exp(
            (-0.5 * (pseudo[e][None, :] - mu) ** 2 / (EPS + sig ** 2)).sum(-1)
        )  # [K]
        xg = (x[s[e]] @ g).reshape(K, M)
        msgs[e] = (xg * gauss[:, None]).sum(0)
    ref = np.zeros((4, M))
    cnt = np.zeros(4)
    np.add.at(ref, r, msgs)
    np.add.at(cnt, r, 1)
    ref = ref / np.maximum(cnt, 1)[:, None] + x @ root + b
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.parametrize("sep", [True])
def test_gmm_separate_gaussians_shape(small_graph, sep):
    s, r, x = small_graph
    pseudo = np.random.default_rng(3).uniform(size=(len(s), 2)).astype(np.float32)
    layer = GMMConv(8, 3, dim=2, kernel_size=2, separate_gaussians=sep)
    params = layer.init(
        jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        edge_attr=jnp.asarray(pseudo), num_nodes=4,
    )
    out = layer.apply(
        params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        edge_attr=jnp.asarray(pseudo), num_nodes=4,
    )
    assert out.shape == (4, 3)
    assert np.isfinite(np.asarray(out)).all()
