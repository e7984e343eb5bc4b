"""Pallas windowed segment-sum: interpret-mode parity vs jax.ops.segment_sum
(the reference's COO==SparseTensor parity pattern, applied to kernels)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.pallas.segment import (
    CHUNK,
    segment_sum_sorted_pallas,
    spmm_coo_sorted_pallas,
)


@pytest.mark.parametrize("n,e,f", [(130, 1024, 8), (256, 2048, 16), (64, 1024, 128)])
def test_segment_sum_sorted_interpret(rng, n, e, f):
    r = np.sort(rng.integers(0, n, e)).astype(np.int32)
    msg = rng.normal(size=(e, f)).astype(np.float32)
    ref = jax.ops.segment_sum(jnp.asarray(msg), jnp.asarray(r), n)
    out = segment_sum_sorted_pallas(
        jnp.asarray(msg), jnp.asarray(r), n, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_segment_sum_skewed_interpret(rng):
    # heavy skew: half the edges hit one window
    n, e, f = 300, 2048, 8
    r = np.concatenate([
        np.zeros(e // 2, np.int32),
        np.sort(rng.integers(1, n, e - e // 2)).astype(np.int32),
    ])
    msg = rng.normal(size=(e, f)).astype(np.float32)
    ref = jax.ops.segment_sum(jnp.asarray(msg), jnp.asarray(r), n)
    out = segment_sum_sorted_pallas(jnp.asarray(msg), jnp.asarray(r), n, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_spmm_coo_sorted_pallas_interpret(rng):
    n, e, f = 100, 700, 8  # e not a multiple of CHUNK -> padding path
    s = rng.integers(0, n, e).astype(np.int32)
    r = np.sort(rng.integers(0, n, e)).astype(np.int32)
    w = rng.normal(size=e).astype(np.float32)
    x = rng.normal(size=(n, f)).astype(np.float32)
    ref = jax.ops.segment_sum(jnp.asarray(x[s] * w[:, None]), jnp.asarray(r), n)
    out = spmm_coo_sorted_pallas(
        jnp.asarray(x), jnp.asarray(s), jnp.asarray(r), n,
        edge_weight=jnp.asarray(w), interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)


# --- flat-grid sorted combine (round-5 power-law tail kernel) --------------

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.pallas.segment import (  # noqa: E402
    combine_sorted_flat_pallas,
    combine_steps_host,
)


def _flat_case(rng, n, v, f, skew=False):
    if skew:
        rows = np.concatenate([
            np.zeros(v // 2, np.int32),
            np.sort(rng.integers(1, n, v - v // 2)).astype(np.int32),
        ])
    else:
        rows = np.sort(rng.integers(0, n, v)).astype(np.int32)
    part = rng.normal(size=(v, f)).astype(np.float32)
    sw, sc = combine_steps_host(rows, n)
    return rows, part, jnp.asarray(sw), jnp.asarray(sc)


@pytest.mark.parametrize("n,v,f,skew", [
    (300, CHUNK, 128, False),
    (1000, 3 * CHUNK, 128, False),
    (300, 2 * CHUNK, 128, True),
])
def test_combine_flat_interpret(rng, n, v, f, skew):
    rows, part, sw, sc = _flat_case(rng, n, v, f, skew)
    ref = jax.ops.segment_sum(jnp.asarray(part), jnp.asarray(rows), n)
    out = combine_sorted_flat_pallas(
        jnp.asarray(part), jnp.asarray(rows), sw, sc, n, interpret=True)
    # two-pass bf16 split carries ~2^-17 relative residue over long hub
    # runs (see kernel header) -- an order below the MXU default-precision
    # f32 noise of the BSR blocks this combine feeds
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-4, atol=5e-4)


def test_combine_flat_init_and_alpha_interpret(rng):
    n, v, f = 500, 2 * CHUNK, 128
    rows, part, sw, sc = _flat_case(rng, n, v, f)
    init = rng.normal(size=(n, f)).astype(np.float32)
    ref = init + np.asarray(
        jax.ops.segment_sum(jnp.asarray(part), jnp.asarray(rows), n))
    out = combine_sorted_flat_pallas(
        jnp.asarray(part), jnp.asarray(rows), sw, sc, n,
        init=jnp.asarray(init), interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-4)

    alpha = 0.37
    out2, ss = combine_sorted_flat_pallas(
        jnp.asarray(part), jnp.asarray(rows), sw, sc, n,
        init=jnp.asarray(init), alpha=alpha, interpret=True)
    np.testing.assert_allclose(np.asarray(out2), alpha * ref,
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(
        float(ss), float((alpha * ref) ** 2).sum() if np.isscalar(ref)
        else float(((alpha * ref) ** 2).sum()), rtol=1e-4)


def test_combine_flat_empty_windows_interpret(rng):
    # windows with no virtual rows must still be initialized (init passes
    # through; zeros otherwise) — the BSR-pad analog
    n, v, f = 1024, CHUNK, 128
    rows = np.sort(rng.integers(512, 640, v)).astype(np.int32)  # 1 window hot
    part = rng.normal(size=(v, f)).astype(np.float32)
    sw, sc = combine_steps_host(rows, n)
    init = rng.normal(size=(n, f)).astype(np.float32)
    ref = init + np.asarray(
        jax.ops.segment_sum(jnp.asarray(part), jnp.asarray(rows), n))
    out = combine_sorted_flat_pallas(
        jnp.asarray(part), jnp.asarray(rows), sw, sc, n,
        init=jnp.asarray(init), interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-4)


def test_bsr_uniform2_interpret(rng):
    # paired one-step-per-row kernel == XLA reference on a uniform-2 matrix
    import scipy.sparse as sp
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.bsr import (
        bsr_from_coo, bsr_matmul_xla,
    )
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.pallas.bsr_kernel import (
        bsr_matmul_uniform2_pallas,
    )

    n = 512  # 4 block rows, banded so each has exactly 2 blocks
    s = np.repeat(np.arange(n), 8)
    r = (s + rng.integers(-32, 33, size=len(s))) % n
    w = rng.normal(size=len(s)).astype(np.float32)
    m, _ = bsr_from_coo(s, r, n, edge_weight=w, block_cols=256)
    assert m.uniform_j == 2, m.uniform_j
    x = jnp.asarray(rng.normal(size=(n, 128)).astype(np.float32))
    ref = np.asarray(bsr_matmul_xla(m, x))
    out = np.asarray(bsr_matmul_uniform2_pallas(m, x, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
