#!/usr/bin/env python
"""A/B the BSR kernel on the bench.py banded graph: block width x window
reordering, dependent-chain timing identical to bench.py (fused epilogue).

Decides the block-width calibration for `ops/plan._STEP_NS` and whether the
`_window_order` x-window dedup (skipped DMAs on repeated windows) delivers
on hardware.

Usage: python benchmark/bsr_ab.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N, E, F = 1 << 17, 1 << 22, 128


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.plan import (
        build_spmm_plan,
    )

    rng = np.random.default_rng(0)
    deg = E // N
    sb = np.repeat(np.arange(N, dtype=np.int64), deg)
    rb = (sb + rng.integers(-64, 65, size=E)) % N
    wb = rng.normal(size=E).astype(np.float32)
    x0 = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))

    @jax.jit
    def trivial(x):
        return jnp.sum(x[0])

    _ = float(trivial(x0))

    def chain_of(plan, k):
        @jax.jit
        def chain_impl(x, p):
            def body(_, carry):
                x, a = carry
                y, ss = p.apply_fused(x, a)
                return y, jax.lax.rsqrt(ss / (N * F) + 1e-6)

            y, a = jax.lax.fori_loop(0, k, body, (x, jnp.float32(1.0)))
            return jnp.sum((y * a)[0])

        return lambda x: chain_impl(x, plan)

    def best_of(f, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            _ = float(f(x0))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    bw = 8.19e11
    for bc in (128, 256, 512):
        plan = build_spmm_plan(sb, rb, N, edge_weight=wb, force="bsr",
                               block_cols=bc, relabel=None)
        m = plan.bsr_fwd
        bcol = np.asarray(m.bcol)
        dup = int(np.sum(bcol[1:] == bcol[:-1]))
        cs, cl = chain_of(plan, 16), chain_of(plan, 64)
        _ = float(cs(x0)), float(cl(x0))
        dt = max((best_of(cl) - best_of(cs)) / 48, 1e-9)
        blk = m.blocks.size * 4
        own = (blk + 2 * N * F * 4) / bw
        act = (blk + (m.nnzb - dup) * m.block_cols * F * 4 + N * F * 4) / bw
        print(
            f"bc={bc} nnzb={m.nnzb} dup={dup/m.nnzb:.1%} "
            f"{dt*1e3:.3f}ms {E/dt/1e9:.2f}B e/s "
            f"step={dt/m.nnzb*1e9:.0f}ns "
            f"own-frac={own/dt:.3f} actual-frac={act/dt:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
