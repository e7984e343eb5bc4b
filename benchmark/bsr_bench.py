"""BSR Pallas kernel benchmark on the matrix-structure (banded) graph at the
bench.py shape: N=131k, E=4.2M, F=128.

Real sparse-matrix graphs (this framework's domain — Classorder patterns)
concentrate edges near the diagonal after RCM; the BSR path turns the
aggregation into a short chain of 128x128 MXU block matmuls with *no*
gather.  Its traffic is blocks + one streaming read of x per touched
block-row — far below the per-edge gather model, which is the point.

Usage: python benchmark/bsr_bench.py [band]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1 << 17
E = 1 << 22
F = 128


def main(band=64):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.bsr import (
        bsr_from_coo,
        bsr_matmul,
        bsr_matmul_xla,
    )

    rng = np.random.default_rng(0)
    deg = E // N
    s = np.repeat(np.arange(N, dtype=np.int64), deg)
    r = (s + rng.integers(-band, band + 1, size=E)) % N
    w = rng.normal(size=E).astype(np.float32)
    x0 = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))

    for dtype, name in ((np.float32, "f32"), (np.dtype("bfloat16"), "bf16")):
        m, leftover = bsr_from_coo(s, r, N, edge_weight=w, dtype=dtype)
        assert not leftover.any()
        nbytes = m.blocks.size * m.blocks.dtype.itemsize
        print(
            f"[{name}] nnzb={m.nnzb} maxj={m.max_blocks_per_row} "
            f"blocks={nbytes/1e6:.0f} MB "
            f"min_traffic={(nbytes + 2*N*F*4)/1e6:.0f} MB",
            flush=True,
        )

        @jax.jit
        def chain(x, m=m):
            def step(_, x):
                y = bsr_matmul(m, x)
                return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-6)

            return jnp.sum(jax.lax.fori_loop(0, 8, step, x)[0])

        @jax.jit
        def trivial(x):
            return jnp.sum(x[0])

        _ = float(chain(x0))
        _ = float(trivial(x0))
        t_rtt = min(
            (lambda t0: (float(trivial(x0)), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(5)
        )
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(chain(x0))
            ts.append(time.perf_counter() - t0)
        dt = max((min(ts) - t_rtt) / 8, 1e-9)
        sol = (nbytes + 2 * N * F * 4) / 8.19e11
        print(
            f"[{name}] bsr_pallas {dt*1e3:8.3f} ms  {E/dt/1e6:7.0f} M edges/s"
            f"  traffic-roofline {sol*1e3:.3f} ms -> fraction {sol/dt:.3f}",
            flush=True,
        )

    # correctness spot check vs XLA reference path on a slice
    m32, _ = bsr_from_coo(s, r, N, edge_weight=w)
    got = np.asarray(bsr_matmul(m32, x0))
    ref = np.asarray(bsr_matmul_xla(m32, x0))
    err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
    print(f"rel err vs xla: {err:.2e}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
