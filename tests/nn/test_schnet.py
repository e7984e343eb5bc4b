import numpy as np
import jax
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.models import (
    SchNet,
    radius_graph_padded,
)


def test_schnet_energy_invariances(rng):
    n = 8
    z = rng.integers(1, 10, n).astype(np.int32)
    pos = rng.normal(size=(n, 3)).astype(np.float32) * 2
    s, r, m = radius_graph_padded(pos, cutoff=5.0, max_edges=64)
    model = SchNet(hidden_channels=16, num_filters=16, num_interactions=2,
                   num_gaussians=10, cutoff=5.0)
    e, params = model.init_with_output(
        jax.random.key(0), jnp.asarray(z), jnp.asarray(pos),
        jnp.asarray(s), jnp.asarray(r), jnp.asarray(m),
    )
    assert e.shape == (1,) and np.isfinite(float(e[0]))

    # translation invariance (distances unchanged)
    e2 = model.apply(params, jnp.asarray(z), jnp.asarray(pos + 5.0),
                     jnp.asarray(s), jnp.asarray(r), jnp.asarray(m))
    np.testing.assert_allclose(float(e2[0]), float(e[0]), rtol=1e-5)

    # rotation invariance
    th = 0.7
    rot = np.asarray([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0],
                      [0, 0, 1]], np.float32)
    e3 = model.apply(params, jnp.asarray(z), jnp.asarray(pos @ rot.T),
                     jnp.asarray(s), jnp.asarray(r), jnp.asarray(m))
    np.testing.assert_allclose(float(e3[0]), float(e[0]), rtol=1e-4)

    # padding edges must not change the energy
    s2, r2, m2 = radius_graph_padded(pos, cutoff=5.0, max_edges=128)
    e4 = model.apply(params, jnp.asarray(z), jnp.asarray(pos),
                     jnp.asarray(s2), jnp.asarray(r2), jnp.asarray(m2))
    np.testing.assert_allclose(float(e4[0]), float(e[0]), rtol=1e-5)
