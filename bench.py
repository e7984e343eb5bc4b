"""Headline benchmark: SpMM aggregate throughput (edges/s) on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": edges_per_s, "unit": "edges/s",
     "vs_baseline": roofline_fraction / 0.70}

``vs_baseline >= 1.0`` means the BASELINE.json target — SpMM at >=70% of the
HBM roofline on one TPU chip — is met.  The roofline model for the gather-
style SpMM ``out[r] += w_e * x[s]`` is memory-bound: each edge must move at
least ``F * dtype_bytes`` of source-row traffic from HBM (plus index reads
and the amortized N*F output writes), so
    speed_of_light_edges_per_s ~= HBM_BW / bytes_per_edge.

Timing note: on this image the TPU is reached through a tunnel where
``block_until_ready`` can return before execution finishes and host readback
carries a large RTT.  We therefore time a *data-dependent chained* loop inside
one jit (y feeds the next iteration, so XLA cannot hoist or elide it) and
difference two chain lengths to cancel the constant readback/RTT cost.
"""
import json
import sys
import time

import numpy as np

# Peak HBM bandwidth (bytes/s) per TPU generation; conservative public figures.
HBM_BW = {
    "v6e": 1.6e12,
    "v5p": 2.765e12,
    "v5": 8.19e11,   # v5e / v5 lite
    "v4": 1.2288e12,
    "v3": 9.0e11,
    "v2": 7.0e11,
    "cpu": 5.0e10,   # rough DDR figure for local runs
}


def _device_bw(dev) -> float:
    kind = getattr(dev, "device_kind", "cpu").lower()
    for key, bw in HBM_BW.items():
        if key in kind:
            return bw
    return HBM_BW["cpu"]


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.ell import (
        ell_from_coo,
        spmm_ell_sum,
    )

    N = 1 << 17          # nodes
    E = 1 << 22          # edges (~4.2M)
    F = 128              # features
    dtype = jnp.float32

    rng = np.random.default_rng(0)
    senders = rng.integers(0, N, size=E).astype(np.int32)
    receivers = np.sort(rng.integers(0, N, size=E).astype(np.int32))
    x0 = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32), dtype)
    w = rng.normal(size=(E,)).astype(np.float32)

    # one-time format conversion (the framework's ToSparseTensor analog)
    ell = ell_from_coo(senders, receivers, N, edge_weight=w, width=64)

    K = 20  # static chain length (traced trip counts hang the compiler here)

    @jax.jit
    def chain(x):
        def body(_, x):
            y = spmm_ell_sum(x, ell)
            # renormalize so the chain neither explodes nor denorms
            return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-6)

        return jnp.sum(jax.lax.fori_loop(0, K, body, x)[0])

    @jax.jit
    def trivial(x):
        return jnp.sum(x[0])  # measures host readback RTT only

    _ = float(chain(x0))    # compile + warm readback path
    _ = float(trivial(x0))

    def best_of(f, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            _ = float(f(x0))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_rtt = best_of(trivial)     # tunnel RTT is noisy: use min-of-3
    t_chain = best_of(chain)
    dt = max((t_chain - t_rtt) / K, 1e-9)

    edges_per_s = E / dt
    itemsize = jnp.dtype(dtype).itemsize
    # amortized traffic: per-edge source rows + weight/index reads + outputs
    total_bytes = E * (F * itemsize + 12) + 2 * N * F * itemsize
    bw = _device_bw(jax.devices()[0])
    roofline_fraction = (total_bytes / bw) / dt

    print(
        json.dumps(
            {
                "metric": "spmm_aggregate_edges_per_s",
                "value": round(edges_per_s, 1),
                "unit": "edges/s",
                "vs_baseline": round(roofline_fraction / 0.70, 4),
            }
        )
    )
    print(
        f"# device={jax.devices()[0].device_kind} N={N} E={E} F={F} "
        f"time/iter={dt*1e3:.3f}ms roofline_fraction={roofline_fraction:.3f}",
        file=sys.stderr,
    )

    # secondary (stderr only): locality-bearing banded graph — the structure
    # real sparse matrices have.  The JSON above stays the adversarial
    # uniform-random case.
    sb = np.repeat(np.arange(N), E // N)
    band = ((sb + rng.integers(-64, 65, size=E)) % N).astype(np.int32)
    ell_b = ell_from_coo(band, np.sort(sb.astype(np.int32)), N, width=64)

    @jax.jit
    def chain_b(x):
        def body(_, x):
            y = spmm_ell_sum(x, ell_b)
            return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-6)

        return jnp.sum(jax.lax.fori_loop(0, K, body, x)[0])

    _ = float(chain_b(x0))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(chain_b(x0))
        ts.append(time.perf_counter() - t0)
    dt_b = max((min(ts) - t_rtt) / K, 1e-9)
    print(
        f"# banded-graph (matrix-structure-like) SpMM: {dt_b*1e3:.3f}ms "
        f"{E/dt_b/1e6:.0f}M edges/s "
        f"roofline_fraction={(total_bytes / bw) / dt_b:.3f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    # the TPU tunnel in this image is flaky after worker crashes — retry a
    # few times rather than losing the round's benchmark record
    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:  # noqa: BLE001
            print(f"# bench attempt {attempt + 1} failed: {e}", file=sys.stderr)
            if attempt == 2:
                raise
            time.sleep(120)
