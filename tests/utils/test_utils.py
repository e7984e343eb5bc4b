"""Utils tests mirroring the reference's ``test/utils/`` battery (degree,
loops, softmax, undirected/coalesce, subgraph, dense-batch, metrics, RCM)."""
import jax
import jax.numpy as jnp
import numpy as np

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.utils import (
    accuracy,
    add_self_loops,
    coalesce,
    contains_self_loops,
    degree,
    dropout_adj,
    f1_score,
    is_undirected,
    k_hop_subgraph,
    precision,
    recall,
    remove_self_loops,
    softmax,
    to_dense_batch,
    to_undirected,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.utils.rcm import (
    bandwidth,
    rcm_order,
)


def test_degree():
    r = jnp.asarray([0, 0, 1, 2, 2, 2])
    np.testing.assert_array_equal(np.asarray(degree(r, 4)), [2, 1, 3, 0])


def test_self_loop_ops():
    ei = np.asarray([[0, 1, 1], [1, 1, 2]])
    assert contains_self_loops(ei)
    ei2, _ = remove_self_loops(ei)
    np.testing.assert_array_equal(ei2, [[0, 1], [1, 2]])
    assert not contains_self_loops(ei2)
    ei3, w3 = add_self_loops(ei2, num_nodes=3)
    assert ei3.shape[1] == 5
    assert contains_self_loops(np.asarray(ei3))


def test_softmax_per_segment():
    logits = jnp.asarray([1.0, 2.0, 3.0, 1.0])
    seg = jnp.asarray([0, 0, 1, 1])
    out = np.asarray(softmax(logits, seg, 2))
    e = np.exp([1.0, 2.0])
    np.testing.assert_allclose(out[:2], e / e.sum(), rtol=1e-6)
    e2 = np.exp([3.0, 1.0])
    np.testing.assert_allclose(out[2:], e2 / e2.sum(), rtol=1e-6)


def test_to_undirected_and_coalesce():
    ei = np.asarray([[0, 1, 0], [1, 2, 1]])  # duplicate (0,1)
    ei2, _ = coalesce(ei, num_nodes=3)
    assert ei2.shape[1] == 2
    eu, _ = to_undirected(ei, num_nodes=3)
    assert is_undirected(np.asarray(eu), num_nodes=3)
    got = set(zip(np.asarray(eu)[0].tolist(), np.asarray(eu)[1].tolist()))
    assert got == {(0, 1), (1, 0), (1, 2), (2, 1)}


def test_k_hop_subgraph():
    # path 0-1-2-3-4 (undirected)
    s = np.asarray([0, 1, 1, 2, 2, 3, 3, 4])
    r = np.asarray([1, 0, 2, 1, 3, 2, 4, 3])
    subset, ss, sr, emask = k_hop_subgraph(np.asarray([2]), 2, s, r, 5)
    assert set(subset.tolist()) == {0, 1, 2, 3, 4}
    subset1, *_ = k_hop_subgraph(np.asarray([0]), 1, s, r, 5)
    assert set(subset1.tolist()) == {0, 1}
    # relabeling compacts ids
    subset2, ss2, sr2, _ = k_hop_subgraph(
        np.asarray([0]), 1, s, r, 5, relabel_nodes=True
    )
    assert ss2.max() < len(subset2) and sr2.max() < len(subset2)


def test_to_dense_batch_masks(rng):
    x = rng.normal(size=(5, 3)).astype(np.float32)
    ids = jnp.asarray([0, 0, 0, 1, 1])
    n_node = jnp.asarray([3, 2])
    dense, mask = to_dense_batch(jnp.asarray(x), ids, n_node, max_nodes=4)
    assert dense.shape == (2, 4, 3)
    np.testing.assert_allclose(np.asarray(dense[0, :3]), x[:3], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dense[1, :2]), x[3:], rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(mask), [[1, 1, 1, 0], [1, 1, 0, 0]]
    )
    assert float(jnp.abs(dense[0, 3]).sum()) == 0


def test_metrics():
    pred = jnp.asarray([0, 1, 1, 0])
    y = jnp.asarray([0, 1, 0, 0])
    assert float(accuracy(pred, y)) == 0.75
    p = np.asarray(precision(pred, y, 2))
    r = np.asarray(recall(pred, y, 2))
    np.testing.assert_allclose(p, [1.0, 0.5])
    np.testing.assert_allclose(r, [2 / 3, 1.0])
    f = np.asarray(f1_score(pred, y, 2))
    assert 0 < f[0] <= 1 and 0 < f[1] <= 1


def test_dropout_adj_mask():
    s = jnp.arange(100)
    r = jnp.roll(s, 1)
    keep = dropout_adj(jax.random.PRNGKey(0), s, r, p=0.5)
    assert keep.shape == (100,)
    assert 20 < int(keep.sum()) < 80
    # composes with an existing mask
    half = jnp.arange(100) < 50
    keep2 = dropout_adj(jax.random.PRNGKey(0), s, r, p=0.0, edge_mask=half)
    np.testing.assert_array_equal(np.asarray(keep2), np.asarray(half))


def test_rcm_reduces_bandwidth(rng):
    # random permutation of a path graph: RCM should restore bandwidth ~1
    n = 200
    s0 = np.arange(n - 1)
    r0 = s0 + 1
    perm = rng.permutation(n)
    s, r = perm[s0], perm[r0]
    rank = np.empty(n, np.int64)
    order = rcm_order(s, r, n)
    rank[order] = np.arange(n)
    bw0 = bandwidth(s, r)
    bw1 = bandwidth(rank[s], rank[r])
    assert bw1 < bw0 / 4
    assert bw1 <= 2
