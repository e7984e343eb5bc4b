"""Edge-partitioned halo-exchange SpMM ≡ serial SpMM on an 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.graph import from_edge_index
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.spmm import spmm_coo
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.parallel import make_mesh
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.parallel.mesh import GRAPH_AXIS
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.parallel.partition import (
    gather_global,
    local_part,
    partition_graph,
    partitioned_spmm,
)


def test_partitioned_spmm_matches_serial(rng):
    n, e, f, parts = 120, 600, 16, 4
    x = rng.normal(size=(n, f)).astype(np.float32)
    s = rng.integers(0, n, e).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    w = rng.normal(size=e).astype(np.float32)
    g = from_edge_index(x, np.stack([s, r]), edge_attr=w)

    pg = partition_graph(g, parts)
    mesh = make_mesh(data=2, graph=parts)

    def fwd(pg):
        p = local_part(pg)
        x_local = p.nodes
        out = partitioned_spmm(x_local, p)
        return gather_global(
            out, p.global_ids, p.node_mask, n, axis_name=GRAPH_AXIS
        )

    specs = jax.tree_util.tree_map(lambda _: P(GRAPH_AXIS), pg)
    out = jax.jit(
        jax.shard_map(
            fwd, mesh=mesh, in_specs=(specs,), out_specs=P(), check_vma=True
        )
    )(pg)

    ref = spmm_coo(
        jnp.asarray(x), jnp.asarray(s), jnp.asarray(r), n,
        edge_weight=jnp.asarray(w),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_partition_mean_aggr(rng):
    n, e, f, parts = 60, 300, 8, 4
    x = rng.normal(size=(n, f)).astype(np.float32)
    s = rng.integers(0, n, e).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    g = from_edge_index(x, np.stack([s, r]))
    pg = partition_graph(g, parts)
    mesh = make_mesh(data=2, graph=parts)

    def fwd(pg):
        p = local_part(pg)
        out = partitioned_spmm(p.nodes, p, aggr="mean")
        return gather_global(out, p.global_ids, p.node_mask, n)

    specs = jax.tree_util.tree_map(lambda _: P(GRAPH_AXIS), pg)
    out = jax.jit(
        jax.shard_map(fwd, mesh=mesh, in_specs=(specs,), out_specs=P(), check_vma=True)
    )(pg)
    ref = spmm_coo(jnp.asarray(x), jnp.asarray(s), jnp.asarray(r), n, aggr="mean")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_overlap_equals_sequential_all_aggrs(rng):
    """Overlapped (interior-wave + halo-wave) SpMM must be numerically
    identical to the sequential extended-table path for every aggregation."""
    n, e, f, parts = 96, 480, 8, 4
    x = rng.normal(size=(n, f)).astype(np.float32)
    s = rng.integers(0, n, e).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    w = rng.normal(size=e).astype(np.float32)
    g = from_edge_index(x, np.stack([s, r]), edge_attr=w)
    pg = partition_graph(g, parts)
    mesh = make_mesh(data=2, graph=parts)
    specs = jax.tree_util.tree_map(lambda _: P(GRAPH_AXIS), pg)

    for aggr in ("add", "mean", "max"):
        def fwd(pg, overlap, aggr=aggr):
            p = local_part(pg)
            ew = None if aggr == "max" else p.edge_weight
            out = partitioned_spmm(
                p.nodes, p, aggr=aggr, edge_weight=ew, overlap=overlap
            )
            return gather_global(out, p.global_ids, p.node_mask, n,
                                 axis_name=GRAPH_AXIS)

        run = lambda ov: jax.jit(
            jax.shard_map(
                lambda q: fwd(q, ov), mesh=mesh, in_specs=(specs,),
                out_specs=P(), check_vma=True,
            )
        )(pg)
        np.testing.assert_allclose(
            np.asarray(run(True)), np.asarray(run(False)),
            rtol=1e-5, atol=1e-5, err_msg=f"aggr={aggr}",
        )
