"""Shoot-out of SpMM formulations at the bench.py shape (N=131k, E=4.2M,
F=128, uniform random, receiver-sorted).

The v5e HBM gather is row-transaction-bound (~525M rows/s independent of row
width — benchmark/microbench_tpu.py), so the op's floor is set by how many
row-gathers a formulation issues.  ELL with width=64 on a deg-32 graph
issues ~1.5-2x E slots; tight widths issue ~E.  This measures the actual
wall-clock of each candidate so bench.py can use the best one.

Timing: chained K iterations inside one jit minus a trivial readback
(cancels the TPU tunnel RTT), min of 3.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1 << 17
E = 1 << 22
F = 128
K = 10


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.ell import (
        ell_from_coo,
        spmm_ell_sum,
    )

    rng = np.random.default_rng(0)
    senders = rng.integers(0, N, size=E).astype(np.int32)
    receivers = np.sort(rng.integers(0, N, size=E).astype(np.int32))
    w = rng.normal(size=(E,)).astype(np.float32)
    x0 = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))

    sj = jnp.asarray(senders)
    rj = jnp.asarray(receivers)
    wj = jnp.asarray(w)

    @jax.jit
    def trivial(x):
        return jnp.sum(x[0])

    _ = float(trivial(x0))
    t_rtt = min(
        (lambda: (lambda t0: (float(trivial(x0)), time.perf_counter() - t0)[1])(
            time.perf_counter()
        ))()
        for _ in range(5)
    )
    print(f"rtt {t_rtt*1e3:.2f} ms", flush=True)

    def bench(name, body, x=x0):
        @jax.jit
        def chain(x):
            def step(_, x):
                y = body(x)
                return (y * jax.lax.rsqrt(
                    jnp.mean((y * y).astype(jnp.float32)) + 1e-6
                ).astype(y.dtype)).astype(x.dtype)

            return jnp.sum(jax.lax.fori_loop(0, K, step, x)[0].astype(jnp.float32))

        try:
            _ = float(chain(x))
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} FAILED: {str(e)[:90]}", flush=True)
            return
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(chain(x))
            ts.append(time.perf_counter() - t0)
        dt = max((min(ts) - t_rtt) / K, 1e-9)
        print(
            f"{name:28s} {dt*1e3:8.3f} ms  {E/dt/1e6:7.0f} M edges/s",
            flush=True,
        )
        return dt

    # 1. sorted-COO segment_sum (XLA scatter-add)
    def coo(x):
        y = wj[:, None] * x[sj]
        return jax.ops.segment_sum(y, rj, num_segments=N, indices_are_sorted=True)

    bench("coo_segment_sum", coo)

    # 2. ELL at several widths
    for width in (8, 16, 32, 64):
        ell = ell_from_coo(senders, receivers, N, edge_weight=w, width=width)
        bench(f"ell_w{width}", lambda x, e=ell: spmm_ell_sum(x, e))

    # 3. gather-only lower bound (no scatter/reduce)
    def gather_only(x):
        return x[sj[:N]] + x[sj[N : 2 * N]]  # N-row output, 2N gathers

    d = bench("gather_2N_rows_only", gather_only)
    if d:
        print(f"  -> implied full-op floor at E gathers: {d/2/N*E*1e3:.2f} ms")

    # 4. bf16 ELL (halves row traffic; tests transaction- vs bandwidth-bound)
    ell32 = ell_from_coo(senders, receivers, N, edge_weight=w, width=32)
    bench("ell_w32_bf16", lambda x, e=ell32: spmm_ell_sum(x, e), x0.astype(jnp.bfloat16))




def gather_structure_probe():
    """Does index structure (sorted, runs) change the HBM gather rate?"""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    M = 1 << 21  # gathered rows per variant

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

    rand = rng.integers(0, N, size=M).astype(np.int32)
    srt = np.sort(rand)
    runs = np.repeat(rng.permutation(N)[: M // 16], 16).astype(np.int32)
    seq = np.tile(np.arange(N, dtype=np.int32), M // N)

    for name, ind in (("rand", rand), ("sorted", srt), ("runs16", runs),
                      ("sequential", seq)):
        ind_j = jnp.asarray(ind)

        @jax.jit
        def g(x, ind_j=ind_j):
            def step(_, acc):
                # N-row output: fold gathered rows in halves to keep output small
                h = x[ind_j[:N]] + x[ind_j[N:2*N]]
                for k in range(2, M // N):
                    h = h + x[ind_j[k*N:(k+1)*N]]
                return acc + jnp.sum(h)
            return jax.lax.fori_loop(0, 3, step, jnp.float32(0))

        _ = float(g(x0))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(g(x0))
            ts.append(time.perf_counter() - t0)
        dt = max((min(ts) - t_rtt) / 3, 1e-9)
        print(f"gather_{name:10s} {dt*1e3:8.3f} ms  {M/dt/1e6:7.0f} M rows/s",
              flush=True)


if __name__ == "__main__" and "structure" in sys.argv:
    gather_structure_probe()
elif __name__ == "__main__":
    main()
