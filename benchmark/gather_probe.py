"""Probe: how fast can a Pallas TPU kernel gather rows by dynamic index?

The whole SpMM roofline question (BASELINE: >=70% of HBM speed-of-light)
reduces to one hardware rate: rows/s of ``y[i] = x[idx[i]]`` for random
``idx``.  XLA's HBM gather measured ~525M rows/s on v5e (transaction-bound,
locality-oblivious — benchmark/microbench_tpu.py).  This probe measures the
alternatives a fused kernel design could build on:

1. ``take``      — tpu.dynamic_gather via jnp.take_along_axis on a
                   VMEM-resident tile (FAILS > 1 vreg along gather dim)
2. ``rowloop``   — explicit fori_loop of per-row dynamic reads from VMEM
                   (measured ~2.4M rows/s — dead)
3. ``onehot``    — gather-as-matmul: onehot(idx) @ x_tile on the MXU;
                   rate scales as 1/TILE (MXU flops = rows*TILE*F)
4. ``xla_rand`` / ``xla_sort`` — XLA HBM gather, random vs sorted indices

Timing: the TPU tunnel RTT (~tens of ms) is cancelled by running the
workload ``reps`` times inside one jit (data-dependent chaining so XLA
cannot CSE) and differencing reps=6 against reps=2.

Usage: python benchmark/gather_probe.py [variant ...]
"""
import sys
import time

import numpy as np

TILE = 4096          # VMEM-resident source rows
F = 128
CHUNK = 2048         # indices gathered per grid step
CH_R, CH_C = 8, CHUNK // 8
STEPS = 512          # grid steps -> total rows gathered = CHUNK*STEPS ~ 1M


def timeit(mk_run, name, rows, n=3):
    """mk_run(reps) -> callable executing the workload ``reps`` times."""
    runs = {r: mk_run(r) for r in (2, 6)}
    for r in (2, 6):
        _ = runs[r]()  # compile

    def best(reps):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            _ = runs[reps]()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    dt = max((best(6) - best(2)) / 4, 1e-9)
    print(f"{name:12s} {dt*1e3:9.2f} ms  {rows/dt/1e6:9.1f} M rows/s "
          f"{rows*F*4/dt/1e9:8.1f} GB/s-equiv", flush=True)
    return dt


def chained(once, x0, reps):
    """Run ``once`` ``reps`` times with a data dependence between iterations
    (so XLA cannot CSE or elide) and return a float to force readback."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(x):
        acc = jnp.float32(0)
        y = x
        for _ in range(reps):
            o = once(y)
            s = jnp.sum(o[0]).astype(jnp.float32)
            y = x * (1 + s * 1e-30).astype(x.dtype)
            acc = acc + s
        return acc

    return lambda: float(f(x0))


def main(variants):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(TILE, F)).astype(np.float32))
    idx = jnp.asarray(
        rng.integers(0, TILE, size=(STEPS, CH_R, CH_C)).astype(np.int32)
    )
    rows = STEPS * CHUNK
    x_spec = pl.BlockSpec((TILE, F), lambda i: (0, 0))
    out_spec = pl.BlockSpec((CHUNK, F), lambda i: (0, 0))
    out_shape = jax.ShapeDtypeStruct((CHUNK, F), jnp.float32)

    if "take" in variants:
        # tpu.dynamic_gather path: indices must have the same shape as the
        # input, so gather TILE rows from the TILE-row resident x per step.
        idx_sq = jnp.asarray(
            rng.integers(0, TILE, size=(STEPS, TILE, 1)).astype(np.int32)
        )

        def k_take(idx_ref, x_ref, o_ref):
            ind = jnp.broadcast_to(idx_ref[0], (TILE, F))
            g = jnp.take_along_axis(x_ref[...], ind, axis=0)
            o_ref[...] += g

        def once_take(xx):
            return pl.pallas_call(
                k_take, grid=(STEPS,),
                in_specs=[
                    pl.BlockSpec((1, TILE, 1), lambda i: (i, 0, 0)),
                    x_spec,
                ],
                out_specs=pl.BlockSpec((TILE, F), lambda i: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((TILE, F), jnp.float32),
            )(idx_sq, xx)

        timeit(lambda r: chained(once_take, x, r), "take", STEPS * TILE)

    if "rowloop" in variants:
        def k_rowloop(idx_ref, x_ref, o_ref):
            def body(i, _):
                j = idx_ref[0, i // CH_C, i % CH_C]
                o_ref[i] = x_ref[j] + o_ref[i]
                return 0
            jax.lax.fori_loop(0, CHUNK, body, 0)

        def once_rowloop(xx):
            return pl.pallas_call(
                k_rowloop, grid=(STEPS,),
                in_specs=[
                    pl.BlockSpec((1, CH_R, CH_C), lambda i: (i, 0, 0),
                                 memory_space=pltpu.SMEM),
                    x_spec,
                ],
                out_specs=out_spec,
                out_shape=out_shape,
            )(idx, xx)

        timeit(lambda r: chained(once_rowloop, x, r), "rowloop", rows)

    if "onehot" in variants:
        # gather via MXU: onehot[CHUNK, TILE] @ x[TILE, F]; onehot built by
        # broadcast compare (VPU).  bf16 matmul.
        xb = x.astype(jnp.bfloat16)
        idx_col = jnp.asarray(
            rng.integers(0, TILE, size=(STEPS, CHUNK, 1)).astype(np.int32)
        )

        def k_onehot(idx_ref, x_ref, o_ref):
            ids = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, TILE), 1)
            oh = (ids == idx_ref[0]).astype(jnp.bfloat16)
            o_ref[...] += jax.lax.dot_general(
                oh, x_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def once_onehot(xx):
            return pl.pallas_call(
                k_onehot, grid=(STEPS,),
                in_specs=[
                    pl.BlockSpec((1, CHUNK, 1), lambda i: (i, 0, 0)),
                    pl.BlockSpec((TILE, F), lambda i: (0, 0)),
                ],
                out_specs=out_spec,
                out_shape=out_shape,
            )(idx_col, xx)

        timeit(lambda r: chained(once_onehot, xb, r), "onehot", rows)

    if "xla_rand" in variants or "xla_sort" in variants:
        N = 1 << 17
        E = 1 << 22
        xx = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
        gi = rng.integers(0, N, size=E).astype(np.int32)
        for name, ind_np in (("xla_rand", gi), ("xla_sort", np.sort(gi))):
            if name not in variants:
                continue
            ind = jnp.asarray(ind_np)

            def once_g(z, ind=ind):
                return jnp.sum(z[ind], axis=0, keepdims=True)

            timeit(lambda r, o=once_g: chained(o, xx, r), name, E)


if __name__ == "__main__":
    main(sys.argv[1:] or ["onehot", "xla_rand", "xla_sort"])
