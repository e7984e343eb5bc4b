"""Micro-benchmarks that pin down the v5e rates the SpMM kernel design
depends on: random-row gather bandwidth (the reference hot path's analog,
``torch_geometric/nn/conv/message_passing.py:124-135`` ``__lift__``),
streaming HBM bandwidth, MXU matmul rates per precision, and the batched
128x128 block-matmul rate that bounds the BSR/banded SpMM path.

Run on the real chip:  python benchmark/microbench_tpu.py
Timing uses the chained-iteration trick from bench.py (data-dependent loop
inside one jit, differenced against a trivial readback) so the TPU-tunnel
RTT cancels.
"""
import time

import numpy as np


def timeit(fn, x0, K, name, work_bytes=None, flops=None, t_rtt=0.0):
    import jax

    _ = float(fn(x0))  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(fn(x0))
        ts.append(time.perf_counter() - t0)
    dt = max((min(ts) - t_rtt) / K, 1e-9)
    line = f"{name:44s} {dt*1e3:9.3f} ms"
    if work_bytes:
        line += f"  {work_bytes/dt/1e9:8.1f} GB/s"
    if flops:
        line += f"  {flops/dt/1e12:8.2f} TFLOP/s"
    print(line, flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    N = 1 << 17
    E = 1 << 22
    F = 128
    K = 20
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, size=E).astype(np.int32))
    idx_sorted = jnp.sort(idx)
    x32 = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    x16 = x32.astype(jnp.bfloat16)
    x32w = jnp.asarray(rng.normal(size=(N, 2 * F)).astype(np.float32))

    @jax.jit
    def trivial(x):
        return jnp.sum(x[0])

    _ = float(trivial(x32))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(trivial(x32))
        ts.append(time.perf_counter() - t0)
    t_rtt = min(ts)
    print(f"rtt {t_rtt*1e3:.2f} ms", flush=True)

    def chain(body):
        @jax.jit
        def f(x):
            def step(_, x):
                y = body(x)
                return y * jax.lax.rsqrt(jnp.mean((y * y).astype(jnp.float32)) + 1e-6).astype(x.dtype)

            return jnp.sum(jax.lax.fori_loop(0, K, step, x)[0].astype(jnp.float32))

        return f

    # 1. random row gather f32: read E rows of 512B, reduce to N rows (mean over 32)
    def g32(x):
        return jax.ops.segment_sum(x[idx], idx_sorted, num_segments=N)

    timeit(chain(g32), x32, K, "gather f32 F=128 random + segsum",
           work_bytes=E * F * 4, t_rtt=t_rtt)

    def g32_nored(x):
        return x[idx][: N]  # gather then slice (forces materialize)

    timeit(chain(g32_nored), x32, K, "gather f32 F=128 random, no reduce",
           work_bytes=E * F * 4, t_rtt=t_rtt)

    def g32_sorted(x):
        return x[idx_sorted][:N]

    timeit(chain(g32_sorted), x32, K, "gather f32 F=128 sorted, no reduce",
           work_bytes=E * F * 4, t_rtt=t_rtt)

    def g16(x):
        return x[idx][:N]

    timeit(chain(g16), x16, K, "gather bf16 F=128 random, no reduce",
           work_bytes=E * F * 2, t_rtt=t_rtt)

    idxs = idx[: E // 2]

    def g32w(x):
        return x[idxs][:N]

    timeit(chain(g32w), x32w, K, "gather f32 F=256 random E/2, no reduce",
           work_bytes=E // 2 * 2 * F * 4, t_rtt=t_rtt)

    # 2. streaming copy bandwidth
    big = jnp.asarray(rng.normal(size=(E // 2, F)).astype(np.float32))  # 1.07GB

    def cp(x):
        return x + 1.0

    timeit(chain(cp), big, K, "stream read+write 1.07GB",
           work_bytes=2 * big.nbytes, t_rtt=t_rtt)

    # 3. MXU rates
    a32 = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))

    def mm_default(a):
        return a @ a

    def mm_highest(a):
        return jax.lax.dot(a, a, precision=jax.lax.Precision.HIGHEST)

    fl = 2 * 4096 ** 3
    timeit(chain(mm_default), a32, K, "matmul 4096^3 f32 default", flops=fl, t_rtt=t_rtt)
    timeit(chain(mm_highest), a32, K, "matmul 4096^3 f32 HIGHEST", flops=fl, t_rtt=t_rtt)
    a16 = a32.astype(jnp.bfloat16)

    def mm16(a):
        return jax.lax.dot(a, a, preferred_element_type=jnp.bfloat16)

    timeit(chain(mm16), a16, K, "matmul 4096^3 bf16", flops=fl, t_rtt=t_rtt)

    # 4. batched 128x128 block matmul (BSR inner op upper bound)
    B = 8192  # number of nonzero blocks: 8192 * 128x128 f32 blocks = 512MB... use bf16
    blk16 = jnp.asarray(rng.normal(size=(B, 128, 128)).astype(np.float32)).astype(jnp.bfloat16)

    def bsrlike(xb):
        # xb: [B,128,F] block inputs; batched matmul = the BSR inner loop
        return jnp.einsum("bij,bjf->bif", blk16, xb, preferred_element_type=jnp.float32).astype(xb.dtype)

    xb0 = jnp.asarray(rng.normal(size=(B, 128, F)).astype(np.float32)).astype(jnp.bfloat16)
    timeit(chain(bsrlike), xb0, K, "batched 8192x(128x128@128x128) bf16",
           work_bytes=blk16.nbytes + 2 * xb0.nbytes,
           flops=B * 2 * 128 * 128 * F, t_rtt=t_rtt)

    # 5. dense-band einsum: 3 block-diagonals (banded matrix-structure SpMM bound)
    nb = N // 128
    diags = jnp.asarray(rng.normal(size=(3, nb, 128, 128)).astype(np.float32)).astype(jnp.bfloat16)

    def banded(x):
        xb = x.reshape(nb, 128, F)
        out = jnp.einsum("bij,bjf->bif", diags[0], xb, preferred_element_type=jnp.float32)
        out += jnp.einsum("bij,bjf->bif", diags[1], jnp.roll(xb, 1, axis=0), preferred_element_type=jnp.float32)
        out += jnp.einsum("bij,bjf->bif", diags[2], jnp.roll(xb, -1, axis=0), preferred_element_type=jnp.float32)
        return out.reshape(N, F).astype(x.dtype)

    timeit(chain(banded), x16, K, "banded 3-blockdiag SpMM bf16 (N=131k)",
           work_bytes=diags.nbytes + 2 * N * F * 2,
           flops=3 * nb * 2 * 128 * 128 * F, t_rtt=t_rtt)


if __name__ == "__main__":
    main()
