"""Per-layer fast-path engagement benchmark (VERDICT r1 item 4).

For every flagship conv, times the default (COO gather + segment reduce)
formulation against the structure-analyzed fast path actually wired into the
layer — SpMM plans (BSR/ELL, ``ops/plan.py``) for the fixed-weight convs,
attention-ELL tables (``ops/ell.EllAttn``) for the attention convs — on the
same banded matrix-structure graph ``bench.py`` uses.  Prints one table row
per layer: default ms, fast ms, speedup.

The reference's analog is the fused-``SparseTensor`` dispatch inside
``torch_geometric/nn/conv/message_passing.py:219-256`` — there it is a
per-call isinstance check; here format selection is a one-time host-side
plan (see ``ops/plan.py`` module docstring).

Run on the TPU: ``python benchmark/layer_fastpath.py``
(add ``--cpu`` for a quick functional check at reduced size).
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _best_of(f, *args, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f(*args)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--log2-nodes", type=int, default=16)
    ap.add_argument("--log2-edges", type=int, default=21)
    ap.add_argument("--features", type=int, default=128)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        args.log2_nodes = min(args.log2_nodes, 12)
        args.log2_edges = min(args.log2_edges, 15)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    import jax.numpy as jnp

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.graph import (
        from_edge_index,
    )
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.conv import (
        GATConv,
        GCNConv,
        GraphConv,
        SAGEConv,
        TransformerConv,
    )
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.ell import (
        ell_attn_pair_from_coo,
    )
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.plan import (
        build_gcn_plan,
        build_mean_plan,
        build_spmm_plan,
    )

    n, e, f = 1 << args.log2_nodes, 1 << args.log2_edges, args.features
    rng = np.random.default_rng(0)
    deg = e // n
    s = np.repeat(np.arange(n, dtype=np.int64), deg)
    r = (s + rng.integers(-64, 65, size=e)) % n
    s, r = s.astype(np.int32), r.astype(np.int32)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    g = from_edge_index(np.zeros((n, 1), np.float32), np.stack([s, r]), num_nodes=n)
    dev = jax.devices()[0].device_kind
    print(f"# device={dev} N={n} E={e} F={f} banded matrix-structure graph")

    plan_sum = build_spmm_plan(s, r, n)
    plan_gcn, gcn_self = build_gcn_plan(s, r, n)
    plan_mean = build_mean_plan(s, r, n)
    attn_ell = ell_attn_pair_from_coo(s, r, n, width=16)

    heads = 4
    cases = [
        (
            "GCNConv",
            GCNConv(in_channels=f, out_channels=f),
            {},
            {"plan": plan_gcn, "plan_self_norm": gcn_self},
        ),
        (
            "GraphConv",
            GraphConv(in_channels=f, out_channels=f),
            {},
            {"plan": plan_sum},
        ),
        (
            "SAGEConv",
            SAGEConv(in_channels=f, out_channels=f),
            {},
            {"plan": plan_mean},
        ),
        (
            "GATConv(h=4)",
            GATConv(in_channels=f, out_channels=f // heads, heads=heads),
            {},
            {"attn_ell": attn_ell},
        ),
        (
            "TransformerConv(h=4)",
            TransformerConv(in_channels=f, out_channels=f // heads, heads=heads),
            {},
            {"attn_ell": attn_ell},
        ),
    ]

    print(f"{'layer':<22} {'default ms':>11} {'fast ms':>9} {'speedup':>8}")
    for name, layer, kw_slow, kw_fast in cases:
        params = layer.init(jax.random.PRNGKey(0), x, g, **kw_fast)

        def run(kw):
            # chain k applications inside one jit; difference two chain
            # lengths so tunnel RTT/dispatch cancels (bench.py convention)
            def chain(k):
                @jax.jit
                def impl(x):
                    def body(_, x):
                        y = layer.apply(params, x, g, **kw)
                        return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-6)

                    return jnp.sum(jax.lax.fori_loop(0, k, body, x)[0])

                return impl

            ks, kl = (2, 6) if args.cpu else (4, 16)
            cs, cl = chain(ks), chain(kl)
            float(cs(x)), float(cl(x))  # compile
            ts = _best_of(lambda: float(cs(x)))
            tl = _best_of(lambda: float(cl(x)))
            return max((tl - ts) / (kl - ks), 1e-9)

        t_slow = run(kw_slow)
        t_fast = run(kw_fast)
        print(
            f"{name:<22} {t_slow*1e3:>11.3f} {t_fast*1e3:>9.3f} "
            f"{t_slow/t_fast:>7.2f}x"
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
