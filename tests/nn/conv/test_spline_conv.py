"""SplineConv parity vs a numpy re-derivation of the degree-1 B-spline
kernel (reference ``torch_geometric/nn/conv/spline_conv.py:133-136`` via
torch-spline-conv's basis definition)."""
import numpy as np

import jax
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import SplineConv
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.conv.geometric import (
    spline_basis,
)


def _np_basis_1d(u, k, is_open):
    m = k - 1 if is_open else k
    v = u * m
    lo = min(int(np.floor(v)), m - 1) if m > 0 else 0
    frac = v - lo
    hi = (lo + 1) % k if not is_open else min(lo + 1, k - 1)
    return [(1.0 - frac, lo), (frac, hi)]


def test_spline_basis_partition_of_unity():
    rng = np.random.default_rng(0)
    pseudo = jnp.asarray(rng.uniform(size=(50, 2)).astype(np.float32))
    coeff, corner = spline_basis(pseudo, (5, 4), (True, False))
    np.testing.assert_allclose(np.asarray(coeff).sum(1), 1.0, atol=1e-5)
    assert int(np.asarray(corner).max()) < 20


def test_spline_conv_matches_numpy(small_graph):
    s, r, x = small_graph
    rng = np.random.default_rng(1)
    pseudo = rng.uniform(size=(len(s), 2)).astype(np.float32)
    layer = SplineConv(8, 6, dim=2, kernel_size=3)
    params = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        edge_attr=jnp.asarray(pseudo), num_nodes=4,
    )
    got = np.asarray(layer.apply(
        params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        edge_attr=jnp.asarray(pseudo), num_nodes=4,
    ))
    assert got.shape == (4, 6)

    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    W, root, bias = p["weight"], p["root"], p["bias"]
    msgs = np.zeros((len(s), 6))
    for e in range(len(s)):
        terms = []
        for c0, i0 in _np_basis_1d(pseudo[e, 0], 3, True):
            for c1, i1 in _np_basis_1d(pseudo[e, 1], 3, True):
                terms.append((c0 * c1, i0 + 3 * i1))
        for coeff, kidx in terms:
            msgs[e] += coeff * (x[s[e]] @ W[kidx])
    ref = np.zeros((4, 6))
    cnt = np.zeros(4)
    np.add.at(ref, r, msgs)
    np.add.at(cnt, r, 1)
    ref = ref / np.maximum(cnt, 1)[:, None]
    ref = ref + x @ root + bias
    np.testing.assert_allclose(got, ref, atol=1e-5)
