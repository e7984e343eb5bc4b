"""Chain-differenced steady-state timing for the fused QR run.

The axon tunnel charges a flat ~20 ms per host sync, so single-shot
timings are RTT-bound; tiny matrices additionally finish in microseconds,
far below the jitter.  Remedy: run the factorization k times inside ONE
``lax.fori_loop`` (compiled once regardless of k, data-dependent across
iterations so XLA cannot CSE), difference a long and a short chain, and
pick k so the differenced work is ≥ tens of milliseconds.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def make_chain(run, pool_size, dtype=jnp.float32):
    """Returns chain(k) -> jitted fn(vals, arrs) running the fused
    factorization k times with a data dependence between iterations."""
    def chain(k):
        @jax.jit
        def impl(vals, arrs):
            def body(i, acc):
                pool, _ = run.raw(jnp.zeros(pool_size, dtype),
                                  vals + acc * 1e-30, arrs)
                # depend on EVERY output element — with exact per-slab
                # dataflow, depending on pool[0] alone lets XLA dead-code
                # eliminate all fronts that don't feed it
                return acc + jnp.sum(pool) * 1e-12
            return jax.lax.fori_loop(0, k, body, jnp.zeros((), dtype))
        return impl
    return chain


def time_factorize(run, plan, vals, *, min_work_s=0.15, reps=4):
    """Steady-state seconds per factorization (chain-differenced)."""
    chain = make_chain(run, plan.pool_size)
    # quick estimate with a small chain to size the real one
    c8 = chain(8)
    c8(vals, run.arrays).block_until_ready()
    t0 = time.time()
    c8(vals, run.arrays).block_until_ready()
    est = max((time.time() - t0) / 8, 1e-7)
    k = int(np.clip(min_work_s / est, 8, 4096))
    c_s, c_l = chain(k), chain(2 * k)
    for c in (c_s, c_l):
        c(vals, run.arrays).block_until_ready()
    ts, tl = [], []
    for _ in range(reps):
        t0 = time.time(); c_s(vals, run.arrays).block_until_ready()
        ts.append(time.time() - t0)
        t0 = time.time(); c_l(vals, run.arrays).block_until_ready()
        tl.append(time.time() - t0)
    return max(min(tl) - min(ts), 1e-9) / k
