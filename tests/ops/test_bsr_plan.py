"""BSR SpMM + plan dispatch tests (reference hot-path analog:
``torch_geometric/nn/conv/message_passing.py:219-256`` fused dispatch)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.bsr import (
    bsr_from_coo,
    bsr_matmul_xla,
    bsr_transpose_coo,
    spmm_bsr,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.pallas.bsr_kernel import (
    bsr_matmul_pallas,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.plan import (
    build_gcn_plan,
    build_mean_plan,
    build_spmm_plan,
    pick_ell_width,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.utils.rcm import (
    bandwidth,
    rcm_order,
    relabel_coo,
)


def _random_graph(n, e, seed=0, weighted=True):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n, e).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    w = rng.normal(size=e).astype(np.float32) if weighted else None
    return s, r, w


def _dense(s, r, w, n):
    A = np.zeros((n, n), np.float32)
    np.add.at(A, (r, s), np.ones(len(s), np.float32) if w is None else w)
    return A


class TestBsr:
    def test_matches_dense(self):
        n, e, f = 300, 2500, 32
        s, r, w = _random_graph(n, e)
        x = jnp.asarray(np.random.default_rng(1).normal(size=(n, f)).astype(np.float32))
        ref = _dense(s, r, w, n) @ np.asarray(x)
        m, leftover = bsr_from_coo(s, r, n, edge_weight=w)
        assert not leftover.any()
        np.testing.assert_allclose(bsr_matmul_xla(m, x), ref, atol=1e-4)
        np.testing.assert_allclose(
            bsr_matmul_pallas(m, x, interpret=True), ref, atol=1e-4
        )

    def test_hybrid_split_partitions_edges(self):
        n, e = 300, 2000
        s, r, w = _random_graph(n, e, seed=2)
        m, leftover = bsr_from_coo(s, r, n, edge_weight=w, min_edges_per_block=5)
        x = jnp.asarray(np.random.default_rng(3).normal(size=(n, 16)).astype(np.float32))
        kept = ~leftover
        ref = _dense(s[kept], r[kept], w[kept], n) @ np.asarray(x)
        np.testing.assert_allclose(bsr_matmul_xla(m, x), ref, atol=1e-4)

    def test_grad_is_transpose_spmm(self):
        n, e, f = 200, 1500, 8
        s, r, w = _random_graph(n, e, seed=4)
        m, _ = bsr_from_coo(s, r, n, edge_weight=w)
        mT, _ = bsr_transpose_coo(s, r, n, edge_weight=w)
        x = jnp.asarray(np.random.default_rng(5).normal(size=(n, f)).astype(np.float32))
        A = _dense(s, r, w, n)
        g = jax.grad(lambda x: jnp.sum(spmm_bsr(x, m, mT) ** 2))(x)
        ref = 2 * A.T @ (A @ np.asarray(x))
        np.testing.assert_allclose(g, ref, atol=1e-3)

    def test_fused_scale_sumsq_matches_dense(self):
        # apply_fused semantics: (alpha*(A@x), sum(out^2)) — both the Pallas
        # kernel (interpret) and the XLA fallback must match the dense ref
        from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.bsr import (
            bsr_matmul_fused,
        )
        from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.pallas.bsr_kernel import (
            bsr_matmul_fused_pallas,
        )

        n, e, f = 300, 2500, 32
        s, r, w = _random_graph(n, e, seed=21)
        x = jnp.asarray(
            np.random.default_rng(22).normal(size=(n, f)).astype(np.float32)
        )
        alpha = 0.37
        ref = alpha * (_dense(s, r, w, n) @ np.asarray(x))
        ref_ss = float((ref**2).sum())
        m, _ = bsr_from_coo(s, r, n, edge_weight=w)
        y, ss = bsr_matmul_fused(m, x, alpha)  # XLA fallback on CPU
        np.testing.assert_allclose(y, ref, atol=1e-4)
        np.testing.assert_allclose(float(ss), ref_ss, rtol=1e-5)
        yp, ssp = bsr_matmul_fused_pallas(m, x, alpha, interpret=True)
        np.testing.assert_allclose(yp, ref, atol=1e-4)
        np.testing.assert_allclose(float(ssp), ref_ss, rtol=1e-5)

    def test_fused_pallas_empty_block_rows(self):
        # padded zero blocks must not corrupt the sum-of-squares epilogue
        from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.pallas.bsr_kernel import (
            bsr_matmul_fused_pallas,
        )

        n = 256
        s = np.arange(100, dtype=np.int32)
        r = (np.arange(100, dtype=np.int32) * 7) % 128
        m, _ = bsr_from_coo(s, r, n)
        x = jnp.asarray(
            np.random.default_rng(23).normal(size=(n, 8)).astype(np.float32)
        )
        ref = 2.0 * (_dense(s, r, None, n) @ np.asarray(x))
        y, ss = bsr_matmul_fused_pallas(m, x, 2.0, interpret=True)
        np.testing.assert_allclose(y, ref, atol=1e-4)
        np.testing.assert_allclose(float(ss), float((ref**2).sum()), rtol=1e-5)

    def test_empty_block_rows(self):
        # nodes 128..255 receive nothing -> whole block-row empty
        n = 256
        s = np.arange(100, dtype=np.int32)
        r = (np.arange(100, dtype=np.int32) * 7) % 128
        m, _ = bsr_from_coo(s, r, n)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(n, 8)).astype(np.float32))
        out = bsr_matmul_pallas(m, x, interpret=True)
        ref = _dense(s, r, None, n) @ np.asarray(x)
        np.testing.assert_allclose(out, ref, atol=1e-4)
        assert np.all(np.asarray(out[128:]) == 0)


class TestRcm:
    def test_reduces_bandwidth_on_shuffled_band(self):
        rng = np.random.default_rng(0)
        n = 400
        base_s, base_r = [], []
        for i in range(n):
            for d in (-2, -1, 1, 2):
                j = i + d
                if 0 <= j < n:
                    base_s.append(i)
                    base_r.append(j)
        perm = rng.permutation(n)
        s, r = perm[np.array(base_s)], perm[np.array(base_r)]
        assert bandwidth(s, r) > 50
        s2, r2, order = relabel_coo(s, r, n)
        assert bandwidth(s2, r2) <= 8

    def test_permutation_valid(self):
        s, r, _ = _random_graph(100, 300, seed=6)
        order = rcm_order(s, r, 100)
        assert sorted(order.tolist()) == list(range(100))

    def test_relabeled_spmm_equivalence(self):
        n, e, f = 150, 800, 8
        s, r, w = _random_graph(n, e, seed=7)
        x = np.random.default_rng(8).normal(size=(n, f)).astype(np.float32)
        ref = _dense(s, r, w, n) @ x
        s2, r2, order = relabel_coo(s, r, n)
        rank = np.argsort(order)
        plan = build_spmm_plan(s2, r2, n, edge_weight=w)
        out_new = plan.apply(jnp.asarray(x[order]))
        np.testing.assert_allclose(np.asarray(out_new)[rank], ref, atol=1e-3)


class TestPlan:
    @pytest.mark.parametrize("force", ["bsr", "ell", "hybrid"])
    def test_methods_agree(self, force):
        n, e, f = 300, 3000, 16
        s, r, w = _random_graph(n, e, seed=9)
        x = jnp.asarray(np.random.default_rng(10).normal(size=(n, f)).astype(np.float32))
        ref = _dense(s, r, w, n) @ np.asarray(x)
        plan = build_spmm_plan(s, r, n, edge_weight=w, force=force, bsr_min_edges=8)
        np.testing.assert_allclose(plan.apply(x), ref, atol=1e-3)

    def test_auto_selects_bsr_for_banded(self):
        n = 512
        i = np.repeat(np.arange(n), 8)
        j = (i + np.tile(np.arange(-4, 4), n)) % n
        plan = build_spmm_plan(i.astype(np.int32), j.astype(np.int32), n)
        assert plan.method in ("bsr", "hybrid")

    def test_auto_selects_ell_for_sparse_random(self):
        n, e = 4096, 8192
        s, r, _ = _random_graph(n, e, seed=11, weighted=False)
        plan = build_spmm_plan(s, r, n)
        assert plan.method == "ell"

    def test_pick_ell_width_tracks_degree(self):
        r_small = np.repeat(np.arange(100), 3)
        assert pick_ell_width(r_small, 100) <= 8
        r_big = np.repeat(np.arange(10), 60)
        assert pick_ell_width(r_big, 10) >= 16

    def test_auto_degree_relabel_on_powerlaw(self):
        # Zipf-skew graph: identity labels give no dense blocks, degree
        # sorting concentrates hub edges -> plan engages the relabel and
        # stays exact (forward and gradient) vs the dense reference
        rng = np.random.default_rng(42)
        n, e, f = 8192, 65536, 16
        w_node = np.minimum(rng.zipf(1.5, n), n // 8).astype(np.float64)
        p = w_node / w_node.sum()
        s = rng.choice(n, size=e, p=p).astype(np.int64)
        r = rng.choice(n, size=e, p=p).astype(np.int64)
        w = rng.normal(size=e).astype(np.float32) * 0.05
        plan = build_spmm_plan(s, r, n, edge_weight=w)
        assert plan.perm is not None, "degree relabel should engage"
        assert plan.method in ("bsr", "hybrid")
        x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
        A = _dense(s, r, w, n)
        ref = A @ np.asarray(x)
        np.testing.assert_allclose(plan.apply(x), ref, atol=1e-3)
        g = jax.grad(lambda x: jnp.sum(plan.apply(x) ** 2))(x)
        np.testing.assert_allclose(g, 2 * A.T @ (A @ np.asarray(x)),
                                   atol=5e-3)

    def test_apply_relabeled_matches_apply(self):
        # permuted-frame executor: apply(x) == unperm(apply_relabeled(x[perm]))
        rng = np.random.default_rng(7)
        n, e, f = 8192, 65536, 8
        wt = np.minimum(rng.zipf(1.5, n), n // 8).astype(np.float64)
        p = wt / wt.sum()
        s = rng.choice(n, size=e, p=p).astype(np.int64)
        r = rng.choice(n, size=e, p=p).astype(np.int64)
        w = rng.normal(size=e).astype(np.float32) * 0.05
        plan = build_spmm_plan(s, r, n, edge_weight=w)
        assert plan.perm is not None
        x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
        ref = np.asarray(plan.apply(x))
        xp = x[plan.perm]
        out_p = np.asarray(plan.apply_relabeled(xp))
        np.testing.assert_allclose(out_p[np.asarray(plan.inv_perm)], ref,
                                   atol=1e-4)

    def test_no_relabel_on_banded(self):
        # banded graphs already block-dense under identity labels: the cost
        # model must NOT pay the permutation for them
        n = 2048
        i = np.repeat(np.arange(n), 16)
        j = (i + np.tile(np.arange(-8, 8), n)) % n
        plan = build_spmm_plan(i, j, n)
        assert plan.perm is None

    def test_forced_degree_relabel_exactness(self):
        n, e, f = 300, 3000, 8
        s, r, w = _random_graph(n, e, seed=17)
        x = jnp.asarray(np.random.default_rng(18).normal(size=(n, f)).astype(np.float32))
        ref = _dense(s, r, w, n) @ np.asarray(x)
        plan = build_spmm_plan(s, r, n, edge_weight=w, relabel="degree")
        assert plan.perm is not None
        np.testing.assert_allclose(plan.apply(x), ref, atol=1e-3)

    def test_apply_fused_matches_apply(self):
        # plan-level equivalence on both the engaged (pure BSR) and the
        # fallback (ELL) shapes: fused == alpha*apply(x), ss == sum(out^2)
        n, e, f = 300, 3000, 16
        s, r, w = _random_graph(n, e, seed=24)
        x = jnp.asarray(
            np.random.default_rng(25).normal(size=(n, f)).astype(np.float32)
        )
        for force in ("bsr", "ell"):
            plan = build_spmm_plan(s, r, n, edge_weight=w, force=force)
            ref = 1.7 * np.asarray(plan.apply(x))
            y, ss = plan.apply_fused(x, 1.7)
            np.testing.assert_allclose(y, ref, atol=1e-4)
            np.testing.assert_allclose(
                float(ss), float((ref**2).sum()), rtol=1e-5
            )

    def test_plan_grad(self):
        n, e, f = 200, 1200, 8
        s, r, w = _random_graph(n, e, seed=12)
        A = _dense(s, r, w, n)
        x = jnp.asarray(np.random.default_rng(13).normal(size=(n, f)).astype(np.float32))
        for force in ("bsr", "ell", "hybrid"):
            plan = build_spmm_plan(s, r, n, edge_weight=w, force=force)
            g = jax.grad(lambda x: jnp.sum(plan.apply(x) ** 2))(x)
            ref = 2 * A.T @ (A @ np.asarray(x))
            np.testing.assert_allclose(g, ref, atol=1e-3)

    def test_frame_roundtrip_and_chain(self):
        # to_frame/from_frame invert each other, and a frame-resident chain
        # equals the apply chain (the bench.py / multi-layer-GNN contract)
        rng = np.random.default_rng(31)
        n, e, f = 4096, 32768, 8
        wt = np.minimum(rng.zipf(1.5, n), n // 8).astype(np.float64)
        p = wt / wt.sum()
        s = rng.choice(n, size=e, p=p).astype(np.int64)
        r = rng.choice(n, size=e, p=p).astype(np.int64)
        w = rng.normal(size=e).astype(np.float32) * 0.05
        plan = build_spmm_plan(s, r, n, edge_weight=w, relabel="degree")
        assert plan.perm is not None
        x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(plan.from_frame(plan.to_frame(x))), np.asarray(x))
        ref = plan.apply(plan.apply(x))
        framed = plan.from_frame(
            plan.apply_relabeled(plan.apply_relabeled(plan.to_frame(x))))
        np.testing.assert_allclose(np.asarray(framed), np.asarray(ref),
                                   atol=1e-3)

    def test_relabeled_fused_matches(self):
        # hybrid fused path (combine-kernel init + epilogue on TPU, XLA
        # fallback on CPU): y == alpha * apply_relabeled(x), ss == sum(y^2)
        n, e, f = 300, 3000, 16
        s, r, w = _random_graph(n, e, seed=41)
        x = jnp.asarray(
            np.random.default_rng(42).normal(size=(n, f)).astype(np.float32))
        for force in ("bsr", "ell", "hybrid"):
            plan = build_spmm_plan(s, r, n, edge_weight=w, force=force)
            ref = 0.6 * np.asarray(plan.apply_relabeled(x))
            y, ss = plan.apply_relabeled_fused(x, 0.6)
            np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)
            np.testing.assert_allclose(float(ss), float((ref**2).sum()),
                                       rtol=1e-4)

    def test_hybrid_backward_is_independent_decomposition(self):
        # the bwd tables decompose A^T by ITS skew: every edge must appear
        # exactly once across bwd blocks + bwd tail (gradient exactness is
        # the theorem; structure sanity checked here)
        n, e = 512, 8192
        rng = np.random.default_rng(5)
        wt = np.minimum(rng.zipf(1.5, n), n // 4).astype(np.float64)
        p = wt / wt.sum()
        s = rng.choice(n, size=e, p=p).astype(np.int64)
        r = rng.choice(n, size=e, p=p).astype(np.int64)
        w = rng.normal(size=e).astype(np.float32)
        plan = build_spmm_plan(s, r, n, edge_weight=w, force="hybrid",
                               relabel=None)
        A = _dense(s, r, w, n)
        f = 8
        x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
        g = jax.grad(lambda x: jnp.sum(plan.apply(x) ** 2))(x)
        ref = 2 * A.T @ (A @ np.asarray(x))
        np.testing.assert_allclose(np.asarray(g), ref, atol=1e-3)


class TestLayerPlans:
    def _graph(self, n=90, e=400, f=6, seed=14):
        from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.graph import Graph

        s, r, _ = _random_graph(n, e, seed=seed, weighted=False)
        x = np.random.default_rng(seed + 1).normal(size=(n, f)).astype(np.float32)
        g = Graph(
            nodes=jnp.asarray(x),
            senders=jnp.asarray(s),
            receivers=jnp.asarray(r),
            n_node=jnp.asarray([n], np.int32),
            n_edge=jnp.asarray([e], np.int32),
        )
        return g, s, r, x

    def test_graph_conv_plan_equivalence(self):
        from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.conv.graph_conv import (
            GraphConv,
        )

        g, s, r, x = self._graph()
        layer = GraphConv(6, 12)
        params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), g)
        ref = layer.apply(params, jnp.asarray(x), g)
        plan = build_spmm_plan(s, r, g.num_nodes)
        out = layer.apply(params, jnp.asarray(x), g, plan=plan)
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_gcn_conv_plan_equivalence(self):
        from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.conv.gcn_conv import (
            GCNConv,
        )

        g, s, r, x = self._graph(seed=20)
        layer = GCNConv(6, 12)
        params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), g)
        ref = layer.apply(params, jnp.asarray(x), g)
        plan, self_norm = build_gcn_plan(s, r, g.num_nodes)
        out = layer.apply(
            params, jnp.asarray(x), g, plan=plan, plan_self_norm=self_norm
        )
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_sage_conv_plan_equivalence(self):
        from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.conv.sage_conv import (
            SAGEConv,
        )

        g, s, r, x = self._graph(seed=30)
        layer = SAGEConv(6, 12)
        params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), g)
        ref = layer.apply(params, jnp.asarray(x), g)
        plan = build_mean_plan(s, r, g.num_nodes)
        out = layer.apply(params, jnp.asarray(x), g, plan=plan)
        np.testing.assert_allclose(out, ref, atol=1e-4)


def test_bench_banded_plan_shape_pinned():
    # the bench.py headline depends on: pure-BSR method, bc=256 (the
    # recalibrated cost model's pick), and uniform-2 block rows (the
    # paired one-step-per-row kernel dispatch) — pin them so a planner
    # change can't silently drop the headline kernel
    rng = np.random.default_rng(0)
    n, e = 1 << 14, 1 << 19  # bench shape scaled down, same density/band
    s = np.repeat(np.arange(n, dtype=np.int64), e // n)
    r = (s + rng.integers(-64, 65, size=e)) % n
    w = rng.normal(size=e).astype(np.float32)
    plan = build_spmm_plan(s, r, n, edge_weight=w)
    assert plan.method == "bsr"
    assert plan.perm is None
    assert plan.bsr_fwd.block_cols == 256
    assert plan.bsr_fwd.uniform_j == 2
    assert plan.bsr_bwd.uniform_j == 2
