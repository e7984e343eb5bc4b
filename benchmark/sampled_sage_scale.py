#!/usr/bin/env python
"""End-to-end sampled-SAGE throughput at ogbn-arxiv scale — BASELINE
config 4 (the reference's ``examples/reddit.py`` minibatch flow:
NeighborSampler fanout [25, 10] + 2-layer SAGEConv).

No egress, so the graph is synthesized at ogbn-arxiv shape: 169,343
nodes, ~1.2M directed edges, Zipf-1.5 in-degree skew (the power-law
regime Reddit/ogbn live in), 128 features, 40 classes.

Reports per-epoch wall time and end-to-end *base-graph* edges/s (epochs ·
E / wall — the reference's headline unit), plus the sampled-edge rate the
pipeline actually moves through the device.

Usage: python benchmark/sampled_sage_scale.py [--cpu] [--nodes N]
       [--edges E] [--epochs 3] [--batch 1024]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synth_powerlaw(n, e, f, classes, seed=0):
    rng = np.random.default_rng(seed)
    # Zipf-1.5 receiver popularity (hub-heavy, like citation in-degree)
    pop = rng.zipf(1.5, size=n).astype(np.float64)
    p = pop / pop.sum()
    recv = rng.choice(n, size=e, p=p).astype(np.int32)
    send = rng.integers(0, n, size=e).astype(np.int32)
    x = rng.normal(size=(n, f)).astype(np.float32)
    y = rng.integers(0, classes, size=n).astype(np.int32)
    return x, send, recv, y



def _sync(x):
    """Barrier that actually waits under the axon tunnel: block_until_ready
    returns early on remote arrays there, so force a value readback."""
    import jax
    import jax.numpy as jnp

    leaf = [l for l in jax.tree_util.tree_leaves(x)
            if hasattr(l, "dtype")][0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--nodes", type=int, default=169_343)
    ap.add_argument("--edges", type=int, default=1_166_243)
    ap.add_argument("--feat", type=int, default=128)
    ap.add_argument("--classes", type=int, default=40)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--fanouts", type=int, nargs="+", default=[25, 10])
    ap.add_argument("--skip-sampled", action="store_true",
                    help="skip the sampled-training phase")
    ap.add_argument("--feat-dtype", default="f32", choices=["f32", "bf16"],
                    help="feature-table storage dtype for the scan phase "
                         "(bf16 halves the gather bytes; cast-after-gather "
                         "keeps the model math f32 — round-5 task-7 A/B)")
    ap.add_argument("--scan", action="store_true",
                    help="sampled phase as ONE on-device lax.scan per "
                         "epoch (sampling fused into the program; "
                         "train.make_scanned_sampled_trainer) instead of "
                         "one dispatch per minibatch")
    ap.add_argument("--infer-iters", type=int, default=20,
                    help="timed iterations of full-graph layer-wise "
                         "inference (plan on/off); 0 disables")
    ap.add_argument("--fullbatch-epochs", type=int, default=20,
                    help="full-batch training epochs timed plan on/off; "
                         "0 disables")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import flax.linen as nn
    import jax.numpy as jnp
    import optax

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data import (
        NeighborSampler,
    )
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import (
        SAGEConv,
    )

    x, send, recv, y = synth_powerlaw(
        args.nodes, args.edges, args.feat, args.classes)
    n = args.nodes
    train_idx = np.arange(0, n, 2)  # ~50% train split like arxiv's 54%

    t0 = time.time()
    loader = NeighborSampler(
        send, recv, n, sizes=args.fanouts, node_idx=train_idx,
        batch_size=args.batch, shuffle=True)
    t_table = time.time() - t0

    dims = (256, args.classes)

    class SAGE(nn.Module):
        @nn.compact
        def __call__(self, h, blocks):
            for i, blk in enumerate(blocks):
                h_dst = h[: blk.num_dst]
                h = SAGEConv((h.shape[-1], h.shape[-1]), dims[i],
                             name=f"conv{i}")((h, h_dst), blk)
                if i < len(dims) - 1:
                    h = nn.relu(h)
            return jax.nn.log_softmax(h)

    class FullSAGE(nn.Module):
        """Full-graph twin of SAGE (same param names ⇒ trained params
        transfer) — the reference flow's layer-wise inference
        (``distributed_sampling.py:36-58``); ``plan`` engages the
        structure-analyzed hybrid SpMM (``ops/plan.build_mean_plan``)."""

        @nn.compact
        def __call__(self, h, s, r, plan=None):
            for i, d in enumerate(dims):
                h = SAGEConv((h.shape[-1], h.shape[-1]), d,
                             name=f"conv{i}")(h, s, r, plan=plan)
                if i < len(dims) - 1:
                    h = nn.relu(h)
            return jax.nn.log_softmax(h)

    model = SAGE()
    tx = optax.adam(3e-3)

    xj = jnp.asarray(x)
    yj = jnp.asarray(y)

    seeds, blocks = next(iter(loader))
    params = model.init(jax.random.key(0), xj[blocks[0].src_ids], blocks)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, feats, blocks, labels):
        def loss(p):
            logp = model.apply(p, feats, blocks)
            return -jnp.mean(
                jnp.take_along_axis(logp, labels[:, None], 1))

        l, grads = jax.value_and_grad(loss)(params)
        u, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), opt, l

    # warm-up compile on one batch
    params, opt, _ = step(params, opt, xj[blocks[0].src_ids], blocks,
                          yj[seeds])
    _sync(params)

    dev = jax.devices()[0].platform
    print(f"device={dev} N={n} E={args.edges} F={args.feat} "
          f"fanouts={args.fanouts} batch={args.batch} "
          f"batches/epoch={len(loader)} table_build={t_table:.2f}s")

    if not args.skip_sampled and args.scan:
        from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.train import (
            make_scanned_sampled_trainer,
        )

        def scan_loss(p, blocks, seeds, xj, yj):
            h = xj[blocks[0].src_ids].astype(jnp.float32)
            logp = model.apply(p, h, blocks)
            return -jnp.mean(
                jnp.take_along_axis(logp, yj[seeds][:, None], 1))

        epoch_fn = make_scanned_sampled_trainer(
            scan_loss, tx, loader.table, args.fanouts)
        if args.feat_dtype == "bf16":
            xj = xj.astype(jnp.bfloat16)
            print("feature table stored bf16 (gather bytes halved; "
                  "cast-after-gather)")
        key = jax.random.key(0)
        seeds0 = jnp.asarray(loader.seed_batches(0))
        # warm-up compile
        tc = time.time()
        params, opt, key, losses = epoch_fn(
            params, opt, key, seeds0, xj, yj)
        _sync(losses)
        print(f"scan epoch compile+run: {time.time() - tc:.1f}s")
        t0 = time.time()
        for epoch in range(args.epochs):
            seeds = jnp.asarray(loader.seed_batches(epoch + 1))
            params, opt, key, losses = epoch_fn(
                params, opt, key, seeds, xj, yj)
            print(f"epoch {epoch}: loss={float(losses[-1]):.4f}")
        wall = time.time() - t0
        nb = seeds0.shape[0]
        # edges per batch: each layer samples fanout edges per FRONTIER
        # node, and the frontier includes the previous layer's sources
        # (seeds + their samples) — matches blk.senders.shape[0]
        spe, frontier = 0, args.batch
        for fo in args.fanouts:
            spe += frontier * fo
            frontier += frontier * fo
        samp_rate = args.epochs * nb * spe / wall
        print(f"scan epoch_time={wall / args.epochs:.3f}s "
              f"(1 dispatch/epoch) "
              f"base_edges_per_s={args.epochs * args.edges / wall / 1e6:.1f}M "
              f"sampled_edges_per_s={samp_rate / 1e6:.1f}M")
    elif not args.skip_sampled:
        sampled_edges = 0
        t0 = time.time()
        for epoch in range(args.epochs):
            te = time.time()
            last = None
            for seeds, blocks in loader:
                params, opt, last = step(
                    params, opt, xj[blocks[0].src_ids], blocks, yj[seeds])
                for blk in blocks:
                    sampled_edges += int(blk.senders.shape[0])
            print(f"epoch {epoch}: {time.time() - te:.3f}s "
                  f"loss={float(last):.4f}")
        wall = time.time() - t0

        base_rate = args.epochs * args.edges / wall
        samp_rate = sampled_edges / wall
        print(f"epoch_time={wall / args.epochs:.3f}s "
              f"base_edges_per_s={base_rate / 1e6:.1f}M "
              f"sampled_edges_per_s={samp_rate / 1e6:.1f}M")

    if args.infer_iters <= 0 and args.fullbatch_epochs <= 0:
        return

    # ------------------------------------------------------------------
    # Hybrid-SpMM-plan on/off: the 0.569-roofline power-law kernel result
    # demonstrated inside the training loop it was built for (full-graph
    # layer-wise inference + full-batch training at ogbn-arxiv scale).
    # ------------------------------------------------------------------
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.plan import (
        build_mean_plan,
    )

    full = FullSAGE()
    sj, rj = jnp.asarray(send), jnp.asarray(recv)

    t0 = time.time()
    plan = build_mean_plan(send, recv, n)
    t_plan = time.time() - t0
    print(f"\nplan: method={plan.method} relabel={'on' if plan.perm is not None else 'off'} "
          f"build={t_plan:.2f}s (host-side, one-time per structure)")

    # senders/receivers are jit ARGUMENTS — closed-over jnp constants of this
    # size get inlined into the HLO and send XLA constant folding into
    # multi-minute compiles (measured: >15 min at 1.17M edges)
    _fwd_off = jax.jit(lambda p, h, s, r: full.apply(p, h, s, r))
    _fwd_on = jax.jit(lambda p, h, s, r, pl: full.apply(p, h, s, r, plan=pl))
    fwd_off = lambda p, h: _fwd_off(p, h, sj, rj)
    fwd_on = lambda p, h, pl: _fwd_on(p, h, sj, rj, pl)

    # correctness: plan path ≡ segment path on the trained params
    o_off = fwd_off(params, xj)
    o_on = fwd_on(params, xj, plan)
    err = float(jnp.max(jnp.abs(o_off - o_on)))
    print(f"plan-vs-segment max |Δlogp| = {err:.2e}")
    # f32 reduction-order noise over 1.17M-edge aggregations scales with
    # the trained params' activation magnitudes; a few e-3 in log-prob is
    # parity, not divergence
    assert err < 1e-2, "plan path diverged from segment path"

    def timed(fn, iters, *a):
        _sync(fn(*a))
        t0 = time.time()
        out = None
        for _ in range(iters):
            out = fn(*a)
        _sync(out)
        return (time.time() - t0) / iters

    layers_e = len(dims) * args.edges  # SpMM edges touched per pass
    if args.infer_iters > 0:
        t_off = timed(fwd_off, args.infer_iters, params, xj)
        t_on = timed(fwd_on, args.infer_iters, params, xj, plan)
        print(f"full-graph inference ({len(dims)} layers): "
              f"plan-off {t_off*1e3:.2f}ms ({layers_e/t_off/1e9:.2f}B e/s)  "
              f"plan-on {t_on*1e3:.2f}ms ({layers_e/t_on/1e9:.2f}B e/s)  "
              f"speedup {t_off/t_on:.2f}x")

    if args.fullbatch_epochs > 0:
        tm = jnp.zeros(n).at[jnp.asarray(train_idx)].set(1.0)

        def make_train(with_plan):
            def loss(p, h, s, r, pl):
                logp = full.apply(p, h, s, r, plan=pl if with_plan else None)
                nll = -jnp.take_along_axis(logp, yj[:, None], 1)[:, 0]
                return jnp.sum(nll * tm) / jnp.sum(tm)

            @jax.jit
            def epoch(p, o, h, s, r, pl):
                l, g = jax.value_and_grad(loss)(p, h, s, r, pl)
                u, o = tx.update(g, o, p)
                return optax.apply_updates(p, u), o, l
            return epoch

        for label, with_plan in (("off", False), ("on", True)):
            ep = make_train(with_plan)
            p, o = params, tx.init(params)
            p, o, l = ep(p, o, xj, sj, rj, plan)  # compile
            _sync(l)
            t0 = time.time()
            for _ in range(args.fullbatch_epochs):
                p, o, l = ep(p, o, xj, sj, rj, plan)
            _sync(l)
            t = (time.time() - t0) / args.fullbatch_epochs
            # fwd + 2 SpMMs in bwd (dx via transpose) per layer ≈ 2x edges
            print(f"full-batch train plan-{label}: {t*1e3:.2f}ms/epoch "
                  f"({2*layers_e/t/1e9:.2f}B e/s fwd+bwd) loss={float(l):.4f}")


if __name__ == "__main__":
    main()
