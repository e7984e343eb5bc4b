

def test_bsr_bf16_blocks_tolerance():
    """block_dtype=bf16: plan output within bf16 tolerance of the f32
    segment reference (the MXU-native half-traffic mode)."""
    import numpy as np
    import jax.numpy as jnp

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.plan import (
        build_spmm_plan,
    )
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.segment import (
        segment_sum,
    )

    rng = np.random.default_rng(0)
    n, e, f = 512, 4096, 16
    s = np.repeat(np.arange(n), e // n)
    r = (s + rng.integers(-8, 9, size=e)) % n
    w = rng.normal(size=e).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))

    plan = build_spmm_plan(s, r, n, edge_weight=w, force="bsr",
                           block_dtype=jnp.bfloat16, relabel=None)
    assert plan.bsr_fwd.blocks.dtype == jnp.bfloat16
    got = np.asarray(plan.apply(x))
    msgs = jnp.asarray(w)[:, None] * x[jnp.asarray(s)]
    want = np.asarray(segment_sum(msgs, jnp.asarray(r), n))
    denom = np.maximum(np.abs(want), 1.0)
    assert np.max(np.abs(got - want) / denom) < 5e-2
