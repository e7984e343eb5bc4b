"""Conv layer tests — the reference's canonical pattern
(``test/nn/conv/test_gcn_conv.py:6-37``): tiny hand graph, shape asserts,
COO path ≡ fused dense path, jit parity, padded ≡ unpadded, bipartite inputs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data import (
    batch_graphs,
    from_edge_index,
    pad_graph,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import (
    GCNConv,
    GraphConv,
    SAGEConv,
)

EDGE_INDEX = np.array([[0, 1, 1, 2, 2, 3], [1, 0, 2, 1, 3, 2]])  # 4-node chain


@pytest.fixture
def small_graph(rng):
    x = rng.normal(size=(4, 5)).astype(np.float32)
    return from_edge_index(x, EDGE_INDEX)


def _padded(g):
    return pad_graph(batch_graphs([g]), num_nodes=16, num_edges=16, num_graphs=2)


@pytest.mark.parametrize(
    "cls,kw",
    [
        (GCNConv, {}),
        (GraphConv, {}),
        (GraphConv, {"aggr": "mean"}),
        (GraphConv, {"aggr": "max"}),
        (SAGEConv, {}),
        (SAGEConv, {"normalize": True}),
    ],
)
def test_shapes_and_padding_invariance(small_graph, cls, kw):
    conv = cls(in_channels=5, out_channels=8, **kw)
    g = small_graph
    xs = jnp.asarray(g.nodes)
    params = conv.init(jax.random.key(0), xs, jnp.asarray(g.senders),
                       jnp.asarray(g.receivers), num_nodes=4)
    out = conv.apply(params, xs, jnp.asarray(g.senders), jnp.asarray(g.receivers),
                     num_nodes=4)
    assert out.shape == (4, 8)

    p = _padded(g)
    out_pad = conv.apply(
        params,
        jnp.asarray(p.nodes),
        jnp.asarray(p.senders),
        jnp.asarray(p.receivers),
        num_nodes=16,
        edge_mask=jnp.asarray(np.arange(16) < 6),
    )
    np.testing.assert_allclose(out_pad[:4], out, rtol=1e-5, atol=1e-6)


def test_gcn_conv_matches_dense_formula(small_graph):
    """GCNConv ≡ D̂^-1/2 (A+I) D̂^-1/2 X W + b with loaded params."""
    conv = GCNConv(in_channels=5, out_channels=3)
    g = small_graph
    xs = jnp.asarray(g.nodes)
    s, r = jnp.asarray(g.senders), jnp.asarray(g.receivers)
    params = conv.init(jax.random.key(1), xs, s, r, num_nodes=4)
    out = conv.apply(params, xs, s, r, num_nodes=4)

    W = np.asarray(params["params"]["weight"])
    b = np.asarray(params["params"]["bias"])
    A = np.zeros((4, 4), np.float32)
    A[EDGE_INDEX[1], EDGE_INDEX[0]] = 1.0
    A += np.eye(4, dtype=np.float32)
    d = A.sum(1)
    Dinv = np.diag(d ** -0.5)
    ref = Dinv @ A @ Dinv @ np.asarray(g.nodes) @ W + b
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_gcn_fused_dense_path_parity(small_graph):
    g = small_graph
    xs = jnp.asarray(g.nodes)
    s, r = jnp.asarray(g.senders), jnp.asarray(g.receivers)
    coo = GCNConv(in_channels=5, out_channels=3)
    fused = GCNConv(in_channels=5, out_channels=3, fused_dense=True)
    params = coo.init(jax.random.key(1), xs, s, r, num_nodes=4)
    a = coo.apply(params, xs, s, r, num_nodes=4)
    b = fused.apply(params, xs, s, r, num_nodes=4)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_graph_conv_formula(small_graph):
    """GraphConv ≡ lin_l(Σ_j w x_j) + lin_r(x_i) (reference graph_conv.py:10-81)."""
    g = small_graph
    xs = jnp.asarray(g.nodes)
    s, r = jnp.asarray(g.senders), jnp.asarray(g.receivers)
    ew = jnp.asarray(np.arange(1.0, 7.0, dtype=np.float32))
    conv = GraphConv(in_channels=5, out_channels=3)
    params = conv.init(jax.random.key(2), xs, s, r, num_nodes=4, edge_weight=ew)
    out = conv.apply(params, xs, s, r, num_nodes=4, edge_weight=ew)

    p = params["params"]
    x = np.asarray(g.nodes)
    agg = np.zeros((4, 5), np.float32)
    for (src, dst, w) in zip(EDGE_INDEX[0], EDGE_INDEX[1], np.asarray(ew)):
        agg[dst] += w * x[src]
    ref = agg @ np.asarray(p["lin_l_weight"]) + np.asarray(p["lin_l_bias"]) \
        + x @ np.asarray(p["lin_r_weight"])
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_sage_conv_bipartite(small_graph, rng):
    """Bipartite (x_src, x_dst) — sampled-block consumption pattern."""
    x_src = jnp.asarray(rng.normal(size=(4, 5)).astype(np.float32))
    x_dst = jnp.asarray(rng.normal(size=(2, 5)).astype(np.float32))
    s = jnp.asarray([0, 1, 2, 3])
    r = jnp.asarray([0, 0, 1, 1])
    conv = SAGEConv(in_channels=5, out_channels=3)
    params = conv.init(jax.random.key(3), (x_src, x_dst), s, r, num_nodes=2)
    out = conv.apply(params, (x_src, x_dst), s, r, num_nodes=2)
    assert out.shape == (2, 3)
    p = params["params"]
    mean0 = np.asarray((x_src[0] + x_src[1]) / 2)
    ref0 = (
        mean0 @ np.asarray(p["lin_l_weight"])
        + np.asarray(p["lin_l_bias"])
        + np.asarray(x_dst[0]) @ np.asarray(p["lin_r_weight"])
    )
    np.testing.assert_allclose(out[0], ref0, rtol=1e-4, atol=1e-5)


def test_jit_parity(small_graph):
    g = small_graph
    xs = jnp.asarray(g.nodes)
    s, r = jnp.asarray(g.senders), jnp.asarray(g.receivers)
    conv = GraphConv(in_channels=5, out_channels=8)
    params = conv.init(jax.random.key(0), xs, s, r, num_nodes=4)
    f = jax.jit(
        lambda p, x, s, r: conv.apply(p, x, s, r, num_nodes=4)
    )
    np.testing.assert_allclose(
        f(params, xs, s, r),
        conv.apply(params, xs, s, r, num_nodes=4),
        rtol=1e-5,
        atol=1e-6,
    )


def test_grads_flow(small_graph):
    g = small_graph
    xs = jnp.asarray(g.nodes)
    s, r = jnp.asarray(g.senders), jnp.asarray(g.receivers)
    conv = GCNConv(in_channels=5, out_channels=3)
    params = conv.init(jax.random.key(0), xs, s, r, num_nodes=4)

    def loss(p):
        return jnp.sum(conv.apply(p, xs, s, r, num_nodes=4) ** 2)

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g_))) for g_ in flat)
    assert any(np.any(np.asarray(g_) != 0) for g_ in flat)
