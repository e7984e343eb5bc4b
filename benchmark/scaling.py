#!/usr/bin/env python
"""Edges/s scaling-efficiency benchmark over the ``graph`` mesh axis —
the BASELINE target's harness (>=80 % efficiency at 2 hosts, edge-
partitioned graph, all-to-all boundary exchange).

Runs the partitioned halo-exchange SpMM layer at P = 1, 2, 4, ... parts over
the available devices and reports edges/s and parallel efficiency vs P=1.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python benchmark/scaling.py --cpu --nodes 20000 --edges 200000
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--nodes", type=int, default=20000)
    ap.add_argument("--edges", type=int, default=200000)
    ap.add_argument("--feats", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.graph import (
        from_edge_index,
    )
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.parallel import (
        GRAPH_AXIS,
        local_part,
        make_mesh,
        partition_graph,
        partitioned_spmm,
    )

    rng = np.random.default_rng(0)
    n, e, f = args.nodes, args.edges, args.feats
    # locality-bearing graph (ring-of-neighborhoods): halo stays small
    s = rng.integers(0, n, e)
    r = (s + rng.integers(-50, 51, e)) % n
    x = rng.normal(size=(n, f)).astype(np.float32)
    g = from_edge_index(x, np.stack([s, r]).astype(np.int32))

    nd = len(jax.devices())
    sizes = [p for p in (1, 2, 4, 8, 16) if p <= nd]
    base = None
    print(f"{'parts':>6s} {'ms/layer':>10s} {'edges/s':>12s} {'efficiency':>11s} {'halo':>7s}")
    for parts in sizes:
        pg = partition_graph(g, parts)
        mesh = make_mesh(data=1, graph=parts, devices=jax.devices()[:parts])

        def layer(pg):
            p = local_part(pg)
            out = partitioned_spmm(p.nodes, p)
            return jax.lax.psum(jnp.sum(out), GRAPH_AXIS)

        specs = jax.tree_util.tree_map(lambda _: P(GRAPH_AXIS), pg)
        fn = jax.jit(
            jax.shard_map(
                layer, mesh=mesh, in_specs=(specs,),
                out_specs=P(), check_vma=True,
            )
        )
        _ = float(fn(pg))  # compile
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(args.iters):
            acc += float(fn(pg))
        dt = (time.perf_counter() - t0) / args.iters
        eps = e / dt
        if base is None:
            base = eps
        eff = eps / (base * parts)
        halo = int(np.sum(np.asarray(pg.halo_send_mask)))
        print(f"{parts:6d} {dt*1e3:10.2f} {eps:12.0f} {eff:10.1%} {halo:7d}")


if __name__ == "__main__":
    main()
