"""PointNetConv (reference ``point_conv.py``) parity vs numpy."""
import numpy as np

import flax.linen as fnn
import jax
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import PointNetConv


def test_pointnet_matches_numpy(small_graph):
    s, r, x = small_graph
    rng = np.random.default_rng(4)
    pos = rng.normal(size=(4, 3)).astype(np.float32)

    layer = PointNetConv(local_nn=fnn.Dense(7), global_nn=fnn.Dense(5))
    params = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(pos),
        jnp.asarray(s), jnp.asarray(r), num_nodes=4,
    )
    got = np.asarray(layer.apply(
        params, jnp.asarray(x), jnp.asarray(pos), jnp.asarray(s),
        jnp.asarray(r), num_nodes=4,
    ))
    assert got.shape == (4, 5)

    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    lw, lb = p["local_nn"]["kernel"], p["local_nn"]["bias"]
    gw, gb = p["global_nn"]["kernel"], p["global_nn"]["bias"]
    ss = np.concatenate([s, np.arange(4)])
    rr = np.concatenate([r, np.arange(4)])
    msgs = np.concatenate([x[ss], pos[ss] - pos[rr]], axis=1) @ lw + lb
    ref = np.full((4, 7), -np.inf)
    for e in range(len(ss)):
        ref[rr[e]] = np.maximum(ref[rr[e]], msgs[e])
    ref = ref @ gw + gb
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_pointnet_without_features(small_graph):
    s, r, _ = small_graph
    pos = np.random.default_rng(5).normal(size=(4, 3)).astype(np.float32)
    layer = PointNetConv()
    params = layer.init(
        jax.random.PRNGKey(0), None, jnp.asarray(pos), jnp.asarray(s),
        jnp.asarray(r), num_nodes=4,
    )
    out = layer.apply(params, None, jnp.asarray(pos), jnp.asarray(s),
                      jnp.asarray(r), num_nodes=4)
    assert out.shape == (4, 3)
