#!/usr/bin/env python
"""Re-measure full-batch SAGE training epoch time, plan on vs off, with an
unambiguous protocol: K epochs inside ONE jitted ``lax.scan`` program (one
dispatch, one readback that consumes the final params), per-epoch time by
chain differencing two K values.  Written because the per-call timing in
``sampled_sage_scale.py`` produced a physically impossible plan-on number
(0.13 ms/epoch < the plan's own ~1.5 ms HBM traffic floor).

Usage: python benchmark/fullbatch_plan_check.py [--nodes N] [--edges E]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--nodes", type=int, default=169_343)
    ap.add_argument("--edges", type=int, default=1_166_243)
    ap.add_argument("--feat", type=int, default=128)
    ap.add_argument("--classes", type=int, default=40)
    ap.add_argument("--k-short", type=int, default=2)
    ap.add_argument("--k-long", type=int, default=12)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import flax.linen as nn
    import jax.numpy as jnp
    import optax

    from benchmark.sampled_sage_scale import synth_powerlaw
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import (
        SAGEConv,
    )
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.plan import (
        build_mean_plan,
    )

    x, send, recv, y = synth_powerlaw(
        args.nodes, args.edges, args.feat, args.classes)
    n = args.nodes
    dims = (256, args.classes)

    class FullSAGE(nn.Module):
        @nn.compact
        def __call__(self, h, s, r, plan=None):
            for i, d in enumerate(dims):
                h = SAGEConv((h.shape[-1], h.shape[-1]), d,
                             name=f"conv{i}")(h, s, r, plan=plan)
                if i < len(dims) - 1:
                    h = nn.relu(h)
            return jax.nn.log_softmax(h)

    model = FullSAGE()
    tx = optax.adam(3e-3)
    xj = jnp.asarray(x)
    yj = jnp.asarray(y)
    sj, rj = jnp.asarray(send), jnp.asarray(recv)
    tm = jnp.zeros(n).at[::2].set(1.0)

    t0 = time.time()
    plan = build_mean_plan(send, recv, n)
    print(f"plan build {time.time()-t0:.1f}s method={plan.method}",
          flush=True)

    params = model.init(jax.random.key(0), xj, sj, rj)

    def make_scan(k, with_plan, ybuf=None, tbuf=None):
        yk = yj if ybuf is None else ybuf
        tk = tm if tbuf is None else tbuf

        @jax.jit
        def run(p, h, s, r, pl):
            o = tx.init(p)

            def loss(p):
                logp = model.apply(p, h, s, r,
                                   plan=pl if with_plan else None)
                nll = -jnp.take_along_axis(logp, yk[:, None], 1)[:, 0]
                return jnp.sum(nll * tk) / jnp.sum(tk)

            def body(carry, _):
                p, o = carry
                l, g = jax.value_and_grad(loss)(p)
                u, o = tx.update(g, o, p)
                return (optax.apply_updates(p, u), o), l

            (p, o), ls = jax.lax.scan(body, (p, o), None, length=k)
            # consume params so no epoch can be dead-code eliminated
            leaves = jax.tree_util.tree_leaves(p)
            return ls[-1], sum(jnp.sum(jnp.abs(l)) for l in leaves)

        return run

    def sync(out):
        # value readback: block_until_ready is NOT a reliable barrier for
        # small/scalar outputs through the axon tunnel (measured); forcing
        # the value is
        return tuple(float(o) for o in out)

    # frame-resident variant: node-indexed inputs relabeled ONCE into the
    # plan's degree-sorted frame (features, labels, train mask — all
    # permutation-equivariant), then every epoch runs permute-free.  This
    # is the deployment recipe for chained full-batch training on a
    # relabeling plan; `plan-on` keeps the per-layer permutes for
    # comparison.
    if plan.perm is not None:
        framed_inputs = (xj[plan.perm], yj[plan.perm], tm[plan.perm])
        plan_framed = plan._replace(perm=None, inv_perm=None)
    else:
        framed_inputs = (xj, yj, tm)
        plan_framed = plan

    def run_mode(label, wp, inputs, pl, ybuf, tbuf):
        rs = make_scan(args.k_short, wp, ybuf, tbuf)
        rl = make_scan(args.k_long, wp, ybuf, tbuf)
        t0 = time.time()
        sync(rs(params, inputs, sj, rj, pl))
        t1 = time.time()
        sync(rl(params, inputs, sj, rj, pl))
        t_compile = (t1 - t0, time.time() - t1)

        def best(fn, reps=3):
            ts = []
            for _ in range(reps):
                t0 = time.time()
                sync(fn(params, inputs, sj, rj, pl))
                ts.append(time.time() - t0)
            return min(ts)

        ts_, tl_ = best(rs), best(rl)
        dt = (tl_ - ts_) / (args.k_long - args.k_short)
        last = sync(rl(params, inputs, sj, rj, pl))
        print(f"plan-{label}: {dt*1e3:.2f}ms/epoch "
              f"(short {ts_*1e3:.1f}ms long {tl_*1e3:.1f}ms, "
              f"compiles {t_compile[0]:.0f}s/{t_compile[1]:.0f}s) "
              f"loss={last[0]:.4f}", flush=True)

    run_mode("off", False, xj, plan, yj, tm)
    run_mode("on", True, xj, plan, yj, tm)
    run_mode("framed", True, framed_inputs[0], plan_framed,
             framed_inputs[1], framed_inputs[2])


if __name__ == "__main__":
    main()
