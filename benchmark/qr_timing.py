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


def time_factorize(run, plan, vals, *, min_work_s=0.15, reps=3):
    """Steady-state seconds per factorization.

    The tunnel both charges a flat per-sync cost AND sporadically returns
    anomalously fast (opportunistic result reuse), so neither single-shot
    nor min-of-repeats timing is trustworthy.  Scheme: per chain length,
    take the MEDIAN of ``reps`` runs with per-run-perturbed inputs; then
    the slope between two chain lengths (k, 2k) cancels fixed costs."""
    chain = make_chain(run, plan.pool_size)

    def measure(c, k):
        ts = []
        for i in range(reps):
            v = vals * (1.0 + 1e-6 * (i + 1))
            v.block_until_ready()
            t0 = time.time()
            c(v, run.arrays).block_until_ready()
            ts.append(time.time() - t0)
        return float(np.median(ts))

    c8 = chain(8)
    c8(vals, run.arrays).block_until_ready()
    est = max(measure(c8, 8) / 8, 1e-7)
    k = int(np.clip(min_work_s / est, 8, 4096))
    c_s, c_l = chain(k), chain(2 * k)
    for c in (c_s, c_l):
        c(vals, run.arrays).block_until_ready()
    t_s = measure(c_s, k)
    t_l = measure(c_l, 2 * k)
    return max(t_l - t_s, 1e-9) / k
