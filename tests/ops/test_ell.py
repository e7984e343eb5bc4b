"""ELL (padded-CSR) SpMM vs COO reference — format-parity tests in the
spirit of the reference's COO ≡ SparseTensor checks
(``test/nn/conv/test_gcn_conv.py:6-37``)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.ell import (
    ell_from_coo,
    ell_pair_from_coo,
    spmm_ell,
    spmm_ell_max,
    spmm_ell_mean,
    spmm_ell_sum,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.spmm import spmm_coo


def _case(rng, n=50, e=300, f=8, weighted=True):
    s = rng.integers(0, n, size=e).astype(np.int32)
    r = rng.integers(0, n, size=e).astype(np.int32)
    w = rng.normal(size=e).astype(np.float32) if weighted else None
    if w is not None:
        w[np.abs(w) < 1e-3] += 1.0  # keep weights nonzero (0 marks padding)
    x = rng.normal(size=(n, f)).astype(np.float32)
    return s, r, w, x


@pytest.mark.parametrize("width", [4, 16, 64])
def test_ell_sum_matches_coo(rng, width):
    s, r, w, x = _case(rng)
    ell = ell_from_coo(s, r, 50, edge_weight=w, width=width)
    ref = spmm_coo(jnp.asarray(x), jnp.asarray(s), jnp.asarray(r), 50,
                   edge_weight=jnp.asarray(w))
    out = spmm_ell_sum(jnp.asarray(x), ell)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_ell_mean_max_match_coo(rng):
    s, r, w, x = _case(rng, weighted=False)
    ell = ell_from_coo(s, r, 50, width=8)  # width 8 forces row splitting
    xj = jnp.asarray(x)
    for aggr, fn in [("mean", spmm_ell_mean), ("max", spmm_ell_max)]:
        ref = spmm_coo(xj, jnp.asarray(s), jnp.asarray(r), 50, aggr=aggr)
        out = fn(xj, ell)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5, err_msg=aggr
        )


def test_ell_isolated_nodes_zero(rng):
    # node 49 has no incoming edges -> all aggregations must give 0 rows
    s = np.asarray([0, 1, 2], np.int32)
    r = np.asarray([0, 0, 1], np.int32)
    x = rng.normal(size=(50, 4)).astype(np.float32)
    ell = ell_from_coo(s, r, 50, width=4)
    for fn in (spmm_ell_sum, spmm_ell_mean, spmm_ell_max):
        out = np.asarray(fn(jnp.asarray(x), ell))
        assert np.all(out[2:] == 0), fn.__name__


def test_ell_custom_vjp_matches_coo_grad(rng):
    s, r, w, x = _case(rng, n=30, e=150, f=4)
    fwd, bwd = ell_pair_from_coo(s, r, 30, edge_weight=w, width=16)
    xj = jnp.asarray(x)
    sj, rj, wj = jnp.asarray(s), jnp.asarray(r), jnp.asarray(w)

    def loss_ell(x):
        return jnp.sum(jnp.sin(spmm_ell(x, fwd, bwd)))

    def loss_coo(x):
        return jnp.sum(jnp.sin(spmm_coo(x, sj, rj, 30, edge_weight=wj)))

    g_ell = jax.grad(loss_ell)(xj)
    g_coo = jax.grad(loss_coo)(xj)
    np.testing.assert_allclose(np.asarray(g_ell), np.asarray(g_coo), rtol=1e-4, atol=1e-5)
