"""visualization.influence — reference visualization/influence.py:5-15."""
import numpy as np
import jax
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import GCNConv
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.visualization import (
    influence,
)


def test_influence_locality_and_normalization(rng):
    n = 8
    x = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    s = jnp.asarray(list(range(n - 1)) + list(range(1, n)))
    r = jnp.asarray(list(range(1, n)) + list(range(n - 1)))
    conv = GCNConv(4, 4)
    p = conv.init(jax.random.key(0), x, s, r, num_nodes=n)
    I = np.asarray(
        influence(lambda xx: conv.apply(p, xx, s, r, num_nodes=n), x))
    np.testing.assert_allclose(I.sum(1), 1.0, rtol=1e-5)
    # one GCN layer: influence restricted to the 1-hop neighborhood
    assert I[0, 1] > 0 and I[0, 0] > 0
    np.testing.assert_allclose(I[0, 3:], 0.0, atol=1e-8)
