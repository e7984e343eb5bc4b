"""Power-law ELL-tail dissection: gather vs combine cost, width/threshold
sweep, bf16 block break-even — drives the round-5 hybrid redesign."""
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
        build_spmm_plan, degree_sort_order,
    )
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.ell import (
        ell_from_coo, spmm_ell, _ell_gather_sum,
    )
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.bsr import (
        bsr_from_coo, spmm_bsr,
    )

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))

    wn = np.minimum(rng.zipf(1.5, N), N // 16).astype(np.float64)
    pz = wn / wn.sum()
    sz = rng.choice(N, size=E, p=pz).astype(np.int64)
    rz = rng.choice(N, size=E, p=pz).astype(np.int64)
    wz = np.random.default_rng(1).normal(size=E).astype(np.float32)

    order = degree_sort_order(sz, rz, N)
    inv = np.empty(N, np.int64)
    inv[order] = np.arange(N)
    s, r = inv[sz], inv[rz]

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

    # --- part 1: sweep dense split (block_cols, dtype, threshold scale) ----
    for bc in (256, 512):
        for dt, dtn in ((np.float32, "f32"), (jnp.bfloat16, "bf16")):
            for thr_scale in (0.5, 1.0, 2.0):
                from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.plan import _break_even_edges
                thr = max(int(_break_even_edges(bc) * thr_scale), 1)
                m, lo = bsr_from_coo(s, r, N, edge_weight=wz,
                                     min_edges_per_block=thr, dtype=dt,
                                     block_cols=bc)
                tail_e = int(lo.sum())
                blocks_mb = m.blocks.size * m.blocks.dtype.itemsize / 1e6
                dt_b = bench(lambda x, mm: spmm_bsr(x, mm, mm)[:N], 8, 24, m)
                print(f"bc={bc} {dtn} thr={thr}: nnzb={m.nnzb} "
                      f"{blocks_mb:.0f}MB tail={tail_e} "
                      f"bsr_time={dt_b*1e3:.3f}ms", flush=True)

    # --- part 2: tail gather vs combine at several widths -----------------
    # use the f32 bc=512 default threshold tail as the reference tail
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.plan import _break_even_edges
    m, lo = bsr_from_coo(s, r, N, edge_weight=wz,
                         min_edges_per_block=_break_even_edges(512),
                         dtype=np.float32, block_cols=512)
    ts, tr, tw = s[lo], r[lo], wz[lo]
    deg = np.bincount(tr, minlength=N)
    print(f"tail: edges={len(ts)} rows={int((deg>0).sum())} "
          f"deg p50={int(np.median(deg[deg>0]))} "
          f"p90={int(np.percentile(deg[deg>0],90))} "
          f"p99={int(np.percentile(deg[deg>0],99))} max={int(deg.max())}",
          flush=True)
    for w in (2, 4, 8):
        ell = ell_from_coo(ts, tr, N, edge_weight=tw, width=w)
        t_full = bench(lambda x, e: spmm_ell(x, e, e)[:N], 8, 24, ell)
        t_gath = bench(
            lambda x, e: jnp.pad(_ell_gather_sum(x, e),
                                 ((0, N - e.num_virtual_rows), (0, 0)))
            if e.num_virtual_rows < N else _ell_gather_sum(x, e)[:N],
            8, 24, ell)
        print(f"  w={w}: vrows={ell.num_virtual_rows} "
              f"slots={ell.senders.size} full={t_full*1e3:.3f}ms "
              f"gather_only={t_gath*1e3:.3f}ms "
              f"combine={(t_full-t_gath)*1e3:.3f}ms", flush=True)


if __name__ == "__main__":
    main()
