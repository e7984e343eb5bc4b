"""Power-law SpMM breakdown on the real chip — where do the 5 ms go?

Round-5 task 1 (VERDICT): the Zipf-1.5 hybrid plan sits at 0.56 of the
gather roofline; the profile attributed the time to permutes + ELL tail.
This harness measures each component of the hybrid apply separately with
the chain-differenced methodology (value readback, not block_until_ready —
see RESULTS.md round-4 methodology note).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1 << 17
E = 1 << 22
F = 128


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.plan import (
        build_spmm_plan, permute_rows,
    )
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.bsr import (
        spmm_bsr,
    )
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.ell import (
        spmm_ell,
    )

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))

    wn = np.minimum(rng.zipf(1.5, N), N // 16).astype(np.float64)
    pz = wn / wn.sum()
    sz = rng.choice(N, size=E, p=pz).astype(np.int64)
    rz = rng.choice(N, size=E, p=pz).astype(np.int64)
    wz = rng.normal(size=E).astype(np.float32)

    t0 = time.perf_counter()
    plan = build_spmm_plan(sz, rz, N, edge_weight=wz)
    print(f"plan build: {time.perf_counter()-t0:.2f}s method={plan.method} "
          f"bc={plan.bsr_fwd.block_cols if plan.bsr_fwd is not None else 0} "
          f"perm={'yes' if plan.perm is not None else 'no'}")
    if plan.bsr_fwd is not None:
        b = plan.bsr_fwd
        print(f"  bsr: nnzb={b.nnzb} blocks_bytes={b.blocks.size*4/1e6:.1f}MB "
              f"dtype={b.blocks.dtype}")
    for name in ("ell_fwd", "ell_fwd_orig"):
        e = getattr(plan, name)
        if e is not None:
            nslots = e.senders.size
            nz = int((np.asarray(e.weights) != 0).sum())
            print(f"  {name}: width={e.width} vrows={e.num_virtual_rows} "
                  f"slots={nslots} fill={nz/max(nslots,1):.2f} "
                  f"combine={e.needs_combine}")

    def bench(fn, k_s, k_l, *args):
        def chain(k):
            @jax.jit
            def impl(x, *a):
                def body(_, xx):
                    return fn(xx, *a)
                y = jax.lax.fori_loop(0, k, body, x)
                return jnp.sum(y[0])
            return lambda x: impl(x, *args)
        cs, cl = chain(k_s), chain(k_l)
        _ = float(cs(x0)); _ = float(cl(x0))
        def best(f):
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                _ = float(f(x0))
                ts.append(time.perf_counter() - t0)
            return min(ts)
        return max((best(cl) - best(cs)) / (k_l - k_s), 1e-9)

    # full apply (what bench.py times today)
    dt_apply = bench(lambda x, p: p.apply(x), 8, 24, plan)
    print(f"apply (orig frame, 2 permutes/iter): {dt_apply*1e3:.3f}ms")

    # permuted-frame chain (relabel once outside)
    dt_rel = bench(lambda x, p: p.apply_relabeled(x), 8, 24, plan)
    print(f"apply_relabeled (permuted frame):    {dt_rel*1e3:.3f}ms")

    # components in the permuted frame
    if plan.bsr_fwd is not None:
        dt_bsr = bench(
            lambda x, p: spmm_bsr(x, p.bsr_fwd, p.bsr_bwd)[:N], 8, 24, plan)
        print(f"  bsr only:                          {dt_bsr*1e3:.3f}ms")
    if plan.ell_fwd is not None:
        dt_ell = bench(
            lambda x, p: spmm_ell(x, p.ell_fwd, p.ell_bwd)[:N], 8, 24, plan)
        print(f"  ell tail only:                     {dt_ell*1e3:.3f}ms")

    # permute cost (chained, like apply pays it)
    dt_perm = bench(
        lambda x, p: permute_rows(x, p.perm, p.inv_perm), 8, 40, plan)
    print(f"  one chained permute:               {dt_perm*1e3:.3f}ms")

    # bf16 blocks variant in permuted frame
    plan_h = build_spmm_plan(sz, rz, N, edge_weight=wz,
                             block_dtype=jnp.bfloat16)
    dt_rel_h = bench(lambda x, p: p.apply_relabeled(x), 8, 24, plan_h)
    print(f"apply_relabeled bf16 blocks:         {dt_rel_h*1e3:.3f}ms")


if __name__ == "__main__":
    main()
