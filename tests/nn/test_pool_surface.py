"""avg/max pool wrappers + fps/radius/nearest (torch-cluster roles)."""
import numpy as np
import jax
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.graph import (
    from_edge_index,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.pool import (
    avg_pool,
    avg_pool_neighbor_x,
    avg_pool_x,
    fps,
    max_pool,
    max_pool_x,
    nearest,
    radius,
    radius_graph,
)


def _g():
    x = np.asarray([[1.0], [3.0], [5.0], [7.0]], np.float32)
    ei = np.asarray([[0, 1, 2, 3], [1, 0, 3, 2]])
    return from_edge_index(x, ei)


def test_avg_max_pool_coarsen():
    g = _g()
    cluster = np.asarray([0, 0, 1, 1])
    cg = avg_pool(cluster, g)
    np.testing.assert_allclose(np.asarray(cg.nodes).reshape(-1), [2.0, 6.0])
    cg2 = max_pool(cluster, g)
    np.testing.assert_allclose(np.asarray(cg2.nodes).reshape(-1), [3.0, 7.0])
    # intra-cluster edges collapse to none (both edges were internal)
    assert int(cg.n_edge[0]) == 0


def test_pool_x_with_batch():
    x = jnp.asarray([[1.0], [3.0], [10.0], [20.0]])
    cluster = np.asarray([0, 0, 5, 5])  # non-consecutive ids get compacted
    out, batch = avg_pool_x(cluster, x, np.asarray([0, 0, 1, 1]))
    np.testing.assert_allclose(np.asarray(out).reshape(-1), [2.0, 15.0])
    assert np.asarray(batch).tolist() == [0, 1]
    out2, _ = max_pool_x(cluster, x, np.asarray([0, 0, 1, 1]))
    np.testing.assert_allclose(np.asarray(out2).reshape(-1), [3.0, 20.0])


def test_neighbor_x():
    g = _g()
    out = avg_pool_neighbor_x(g)
    # node 0: (x0 + x1)/2 = 2
    np.testing.assert_allclose(np.asarray(out.nodes)[0, 0], 2.0)


def test_neighbor_x_degree2_self_loop_mean():
    # reference avg_pool.py: self-loop-augmented mean (sum_nbrs + x)/(deg+1)
    x = np.asarray([[0.0], [6.0], [12.0]], np.float32)
    ei = np.asarray([[1, 2], [0, 0]])  # node 0 has TWO in-neighbors
    g = from_edge_index(x, ei)
    out = avg_pool_neighbor_x(g)
    np.testing.assert_allclose(np.asarray(out.nodes)[0, 0], 6.0)  # 18/3


def test_fps_spreads():
    # 2 tight clusters far apart: fps with m=2 must pick one from each
    pos = jnp.asarray(
        [[0.0, 0], [0.1, 0], [0.2, 0], [10.0, 0], [10.1, 0], [10.2, 0]])
    picked = np.asarray(fps(pos, num_samples=2))
    assert (picked[0] < 3) != (picked[1] < 3)


def test_fps_batched_per_graph_coverage():
    # two graphs in one batch: every graph must contribute its own picks
    # (torch-cluster fps semantics: ceil(ratio * n_g) per graph, grouped)
    rng = np.random.default_rng(0)
    pos = jnp.asarray(np.concatenate([
        rng.normal(size=(10, 3)), 100.0 + rng.normal(size=(10, 3))
    ]).astype(np.float32))
    batch = jnp.asarray(np.repeat([0, 1], 10))
    picked = np.asarray(fps(pos, ratio=0.5, batch=batch))
    assert len(picked) == 10
    assert (picked[:5] < 10).all() and (picked[5:] >= 10).all()
    assert len(set(picked.tolist())) == 10  # no duplicates


def test_fps_batched_num_samples_proportional():
    pos = jnp.asarray(np.random.default_rng(1).normal(size=(12, 2)),
                      jnp.float32)
    batch = jnp.asarray(np.repeat([0, 1], [8, 4]))
    picked = np.asarray(fps(pos, num_samples=6, batch=batch))
    assert len(picked) == 6
    assert (picked[:4] < 8).all() and (picked[4:] >= 8).all()


def test_radius_and_nearest():
    pos = jnp.asarray([[0.0], [1.0], [5.0]])
    s, r, valid = radius_graph(pos, r=1.5, max_num_neighbors=2)
    pairs = set(zip(np.asarray(s)[np.asarray(valid)].tolist(),
                    np.asarray(r)[np.asarray(valid)].tolist()))
    assert pairs == {(0, 1), (1, 0)}
    idx = np.asarray(nearest(jnp.asarray([[0.9], [4.0]]), pos))
    assert idx.tolist() == [1, 2]
    s2, r2, v2 = radius(pos, jnp.asarray([[0.5]]), r=1.0, max_num_neighbors=3)
    assert np.asarray(v2).sum() == 2  # sources 0 and 1 within 1.0
