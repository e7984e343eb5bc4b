"""Decompose the gap between the raw column-gather rate (~1G rows/s,
spmm_shootout.gather_structure_probe) and spmm_ell_sum (~370M slots/s).

Variants, all N-row output, W=16 column gathers per output row:
  adds       — pure x[idx_k] accumulation (probe reproduction)
  weighted   — + per-slot weight multiply (the ELL formulation)
  weighted32 — weighted at W=32
  bigV       — adds but V=2.25N virtual rows (ELL w16's actual V)
  combine    — adds + sorted segment-sum combine V->N
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1 << 17
F = 128


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))

    @jax.jit
    def trivial(x):
        return jnp.sum(x[0])

    _ = float(trivial(x0))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(trivial(x0))
        ts.append(time.perf_counter() - t0)
    t_rtt = min(ts)
    print(f"rtt {t_rtt*1e3:.2f} ms", flush=True)

    def bench(name, body, slots, K=6):
        @jax.jit
        def chain(x):
            def step(_, x):
                y = body(x)
                return (y * jax.lax.rsqrt(
                    jnp.mean((y * y).astype(jnp.float32)) + 1e-6
                ).astype(y.dtype)).astype(x.dtype)[:N]

            return jnp.sum(jax.lax.fori_loop(0, K, step, x)[0])

        _ = float(chain(x0))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(chain(x0))
            ts.append(time.perf_counter() - t0)
        dt = max((min(ts) - t_rtt) / K, 1e-9)
        print(f"{name:12s} {dt*1e3:8.3f} ms  {slots/dt/1e6:7.0f} M slots/s",
              flush=True)

    W = 16
    idx = jnp.asarray(rng.integers(0, N, size=(W, N)).astype(np.int32))
    wgt = jnp.asarray(rng.normal(size=(W, N)).astype(np.float32))

    def adds(x):
        acc = x[idx[0]]
        for k in range(1, W):
            acc = acc + x[idx[k]]
        return acc

    bench("adds", adds, W * N)

    def weighted(x):
        acc = None
        for k in range(W):
            g = x[idx[k]] * wgt[k][:, None]
            acc = g if acc is None else acc + g
        return acc

    bench("weighted", weighted, W * N)

    W2 = 32
    idx2 = jnp.asarray(rng.integers(0, N, size=(W2, N)).astype(np.int32))
    wgt2 = jnp.asarray(rng.normal(size=(W2, N)).astype(np.float32))

    def weighted32(x):
        acc = None
        for k in range(W2):
            g = x[idx2[k]] * wgt2[k][:, None]
            acc = g if acc is None else acc + g
        return acc

    bench("weighted32", weighted32, W2 * N)

    V = int(2.25 * N) // 128 * 128
    idxv = jnp.asarray(rng.integers(0, N, size=(W, V)).astype(np.int32))

    def bigv(x):
        acc = x[idxv[0]]
        for k in range(1, W):
            acc = acc + x[idxv[k]]
        return acc

    bench("bigV", bigv, W * V)

    rows = jnp.asarray(np.sort(rng.integers(0, N, size=V)).astype(np.int32))

    def combine(x):
        acc = x[idxv[0]]
        for k in range(1, W):
            acc = acc + x[idxv[k]]
        return jax.ops.segment_sum(acc, rows, num_segments=N,
                                   indices_are_sorted=True)

    bench("combine", combine, W * V)


if __name__ == "__main__":
    main()
