"""Attention-ELL (dynamic edge weights) vs COO segment-sum reference.

The scatter-free aggregation path for attention convs: forward, both
gradients (∂x via transpose ELL, ∂alpha via SDDMM), multi-head shapes, and
the GAT / GATv2 / Transformer layer wiring (fast path ≡ default path) in the
spirit of the reference's COO ≡ SparseTensor parity checks
(``test/nn/conv/test_gat_conv.py``)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.ell import (
    ell_attn_pair_from_coo,
    spmm_ell_attn,
)


def _coo_ref(x, alpha, s, r, n):
    msg = x[s] * alpha.reshape(alpha.shape + (1,) * (x.ndim - alpha.ndim))
    return jax.ops.segment_sum(msg, r, n)


def _case(rng, n=40, e=250, f=6, heads=None):
    s = rng.integers(0, n, size=e).astype(np.int32)
    r = rng.integers(0, n, size=e).astype(np.int32)
    if heads is None:
        x = rng.normal(size=(n, f)).astype(np.float32)
        a = rng.normal(size=(e,)).astype(np.float32)
    else:
        x = rng.normal(size=(n, heads, f)).astype(np.float32)
        a = rng.normal(size=(e, heads)).astype(np.float32)
    return s, r, x, a


@pytest.mark.parametrize("width", [4, 16])
@pytest.mark.parametrize("heads", [None, 3])
def test_forward_matches_coo(width, heads):
    rng = np.random.default_rng(0)
    s, r, x, a = _case(rng, heads=heads)
    fwd, bwd = ell_attn_pair_from_coo(s, r, 40, width=width)
    out = spmm_ell_attn(x, a, fwd, bwd, jnp.asarray(s), jnp.asarray(r))
    ref = _coo_ref(x, a, s, r, 40)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("heads", [None, 2])
def test_gradients_match_coo(heads):
    rng = np.random.default_rng(1)
    s, r, x, a = _case(rng, heads=heads)
    fwd, bwd = ell_attn_pair_from_coo(s, r, 40, width=8)
    sj, rj = jnp.asarray(s), jnp.asarray(r)

    def loss_fast(x, a):
        return jnp.sum(jnp.sin(spmm_ell_attn(x, a, fwd, bwd, sj, rj)))

    def loss_ref(x, a):
        return jnp.sum(jnp.sin(_coo_ref(x, a, s, r, 40)))

    gx_f, ga_f = jax.grad(loss_fast, argnums=(0, 1))(x, a)
    gx_r, ga_r = jax.grad(loss_ref, argnums=(0, 1))(x, a)
    np.testing.assert_allclose(gx_f, gx_r, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ga_f, ga_r, rtol=1e-4, atol=1e-5)


def test_isolated_nodes_and_dup_edges():
    # nodes with no in-edges get zeros; duplicate edges accumulate
    s = np.array([0, 0, 1], np.int32)
    r = np.array([2, 2, 0], np.int32)
    x = jnp.arange(8.0).reshape(4, 2)
    a = jnp.asarray([2.0, 3.0, 1.0])
    fwd, bwd = ell_attn_pair_from_coo(s, r, 4, width=4)
    out = spmm_ell_attn(x, a, fwd, bwd, jnp.asarray(s), jnp.asarray(r))
    ref = _coo_ref(x, a, s, r, 4)
    np.testing.assert_allclose(out, ref, atol=1e-6)
    assert np.allclose(out[1], 0) and np.allclose(out[3], 0)


def _layer_parity(cls, **kw):
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data import (
        from_edge_index,
    )

    rng = np.random.default_rng(2)
    n, e, fin = 12, 40, 5
    s = rng.integers(0, n, size=e).astype(np.int32)
    r = rng.integers(0, n, size=e).astype(np.int32)
    x = rng.normal(size=(n, fin)).astype(np.float32)
    g = from_edge_index(x, np.stack([s, r]), num_nodes=n)
    layer = cls(in_channels=fin, out_channels=4, heads=2, **kw)
    params = layer.init(jax.random.PRNGKey(0), x, g)
    base = layer.apply(params, x, g)
    ells = ell_attn_pair_from_coo(s, r, n, width=4)
    fast = layer.apply(params, x, g, attn_ell=ells)
    np.testing.assert_allclose(fast, base, rtol=1e-5, atol=1e-5)


def test_gat_fast_path_parity():
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.conv import GATConv

    _layer_parity(GATConv)


def test_gatv2_fast_path_parity():
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.conv import GATv2Conv

    _layer_parity(GATv2Conv)


def test_transformer_fast_path_parity():
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.conv import (
        TransformerConv,
    )

    _layer_parity(TransformerConv)
