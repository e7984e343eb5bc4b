"""Dense layers vs sparse counterparts — the reference's dense/sparse parity
style (``test/nn/dense/test_dense_gcn_conv.py``)."""
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.graph import from_edge_index
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import GCNConv, SAGEConv, GraphConv
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.dense import (
    DenseGCNConv,
    DenseGraphConv,
    DenseSAGEConv,
    dense_diff_pool,
    dense_mincut_pool,
    to_dense_adjacency,
)

N, F_IN, F_OUT = 6, 5, 7


def _case(rng):
    x = rng.normal(size=(N, F_IN)).astype(np.float32)
    ei = np.stack([rng.integers(0, N, 14), rng.integers(0, N, 14)])
    g = from_edge_index(x, ei)
    xj = jnp.asarray(x)
    adj = to_dense_adjacency(jnp.asarray(ei[0]), jnp.asarray(ei[1]), N)
    return g, xj, adj


def test_dense_gcn_matches_sparse(rng):
    g, x, adj = _case(rng)
    sparse = GCNConv(F_IN, F_OUT)
    out_s, params = sparse.init_with_output(jax.random.key(0), x, jnp.asarray(g.senders),
                                            jnp.asarray(g.receivers), num_nodes=N)
    dense = DenseGCNConv(F_IN, F_OUT)
    dp = {"params": {"weight": params["params"]["weight"],
                     "bias": params["params"]["bias"]}}
    out_d = dense.apply(dp, x[None], adj[None])[0]
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_s), rtol=1e-4, atol=1e-5)


def test_dense_graph_conv_matches_sparse(rng):
    g, x, adj = _case(rng)
    sparse = GraphConv(F_IN, F_OUT)
    out_s, params = sparse.init_with_output(
        jax.random.key(0), x, jnp.asarray(g.senders), jnp.asarray(g.receivers),
        num_nodes=N,
    )
    p = params["params"]
    dp = {"params": {"lin_l_w": p["lin_l_weight"], "lin_r_w": p["lin_r_weight"],
                     "bias": p["lin_l_bias"]}}
    out_d = DenseGraphConv(F_IN, F_OUT).apply(dp, x[None], adj[None])[0]
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_s), rtol=1e-4, atol=1e-5)


def test_dense_sage_matches_sparse(rng):
    g, x, adj = _case(rng)
    # restrict to nodes with incoming edges (dense mean over empty rows = 0
    # either way thanks to the clip)
    sparse = SAGEConv(F_IN, F_OUT)
    out_s, params = sparse.init_with_output(
        jax.random.key(0), x, jnp.asarray(g.senders), jnp.asarray(g.receivers),
        num_nodes=N,
    )
    p = params["params"]
    dp = {"params": {"lin_rel_w": p["lin_l_weight"], "lin_root_w": p["lin_r_weight"],
                     "bias": p["lin_l_bias"]}}
    out_d = DenseSAGEConv(F_IN, F_OUT).apply(dp, x[None], adj[None])[0]
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_s), rtol=1e-4, atol=1e-5)


def test_diff_and_mincut_pool(rng):
    _, x, adj = _case(rng)
    s = jnp.asarray(rng.normal(size=(1, N, 3)).astype(np.float32))
    xp, ap, l1, l2 = dense_diff_pool(x[None], adj[None], s)
    assert xp.shape == (1, 3, F_IN) and ap.shape == (1, 3, 3)
    assert np.isfinite([float(l1), float(l2)]).all()
    xp, ap, l1, l2 = dense_mincut_pool(x[None], adj[None], s)
    assert xp.shape == (1, 3, F_IN) and ap.shape == (1, 3, 3)
    assert np.isfinite([float(l1), float(l2)]).all()
