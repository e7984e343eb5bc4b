"""Conv-zoo tests mirroring the reference's per-conv test pattern
(``test/nn/conv/test_*_conv.py``): fixed tiny graph, shape checks, padding
invariance (padded batch ≡ unpadded), and jit parity."""
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.batch import pad_graph
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.graph import from_edge_index
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import (
    APPNP,
    ARMAConv,
    ChebConv,
    ClusterGCNConv,
    EdgeConv,
    GATConv,
    GATv2Conv,
    GCN2Conv,
    GINConv,
    GINEConv,
    GatedGraphConv,
    NNConv,
    ResGatedGraphConv,
    SGConv,
    TAGConv,
    TransformerConv,
)

N, E, F_IN, F_OUT = 6, 10, 8, 16


def _graph(rng, with_edge_attr=False, edge_dim=4):
    x = rng.normal(size=(N, F_IN)).astype(np.float32)
    ei = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)])
    ea = rng.normal(size=(E, edge_dim)).astype(np.float32) if with_edge_attr else None
    return from_edge_index(x, ei, edge_attr=ea)


class _MLP(nn.Module):
    out: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.out)(nn.relu(nn.Dense(self.out)(x)))


def _layers():
    return [
        ("gat", GATConv(F_IN, F_OUT, heads=2), F_OUT * 2, {}),
        ("gat_mean", GATConv(F_IN, F_OUT, heads=2, concat=False), F_OUT, {}),
        ("gatv2", GATv2Conv(F_IN, F_OUT, heads=2), F_OUT * 2, {}),
        ("gin", GINConv(mlp=_MLP(F_OUT)), F_OUT, {}),
        ("gine", GINEConv(mlp=_MLP(F_OUT), edge_dim=4, node_dim=F_IN), F_OUT,
         {"edge_attr": True}),
        ("cheb", ChebConv(F_IN, F_OUT, K=3), F_OUT, {}),
        ("sg", SGConv(F_IN, F_OUT, K=2), F_OUT, {}),
        ("appnp", APPNP(K=3, alpha=0.1), F_IN, {}),
        ("tag", TAGConv(F_IN, F_OUT, K=2), F_OUT, {}),
        ("cluster", ClusterGCNConv(F_IN, F_OUT, diag_lambda=0.2), F_OUT, {}),
        ("edge", EdgeConv(mlp=_MLP(F_OUT)), F_OUT, {}),
        ("nnconv", NNConv(F_IN, F_OUT, edge_mlp=_MLP(F_IN * F_OUT)), F_OUT,
         {"edge_attr": True}),
        ("gated", GatedGraphConv(out_channels=F_IN + 2, num_layers=2), F_IN + 2, {}),
        ("resgated", ResGatedGraphConv(F_IN, F_OUT), F_OUT, {}),
        ("arma", ARMAConv(F_IN, F_OUT, num_stacks=2, num_layers=2), F_OUT, {}),
        ("arma_shared", ARMAConv(F_IN, F_OUT, num_layers=3, shared_weights=True),
         F_OUT, {}),
        ("transformer", TransformerConv(F_IN, F_OUT, heads=2, edge_dim=4), F_OUT * 2,
         {"edge_attr": True}),
        ("transformer_beta", TransformerConv(F_IN, F_OUT, heads=2, beta=True),
         F_OUT * 2, {}),
        ("gcn2", GCN2Conv(channels=F_IN, alpha=0.2, theta=1.0, layer=2), F_IN,
         {"x0": True}),
    ]


@pytest.mark.parametrize("name,layer,out_dim,opts", _layers(), ids=lambda v: v if isinstance(v, str) else "")
def test_conv_shapes_padding_jit(rng, name, layer, out_dim, opts):
    g = _graph(rng, with_edge_attr=bool(opts.get("edge_attr")))
    gp = pad_graph(g, num_nodes=N + 4, num_edges=E + 6, num_graphs=2)
    gj = jax.tree_util.tree_map(jnp.asarray, g)
    gpj = jax.tree_util.tree_map(jnp.asarray, gp)

    def apply(graph):
        x = graph.nodes
        if opts.get("x0"):
            return layer.init_with_output(jax.random.key(0), x, x * 0.5, graph)
        return layer.init_with_output(jax.random.key(0), x, graph)

    out, params = apply(gj)
    assert out.shape == (N, out_dim), name
    assert np.isfinite(np.asarray(out)).all(), name

    out_pad, _ = apply(gpj)
    # padded graph must reproduce the unpadded output on valid rows
    np.testing.assert_allclose(
        np.asarray(out_pad[:N]), np.asarray(out), rtol=1e-4, atol=1e-5,
        err_msg=f"{name}: padding changed valid-node outputs",
    )

    # jit parity
    if opts.get("x0"):
        fn = jax.jit(lambda p, graph: layer.apply(p, graph.nodes, graph.nodes * 0.5, graph))
    else:
        fn = jax.jit(lambda p, graph: layer.apply(p, graph.nodes, graph))
    out_jit = fn(params, gj)
    np.testing.assert_allclose(
        np.asarray(out_jit), np.asarray(out), rtol=1e-5, atol=1e-6, err_msg=name
    )


def test_agnn_and_pna(rng):
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import AGNNConv, PNAConv

    g = _graph(rng)
    gp = pad_graph(g, num_nodes=N + 4, num_edges=E + 6, num_graphs=2)
    gj = jax.tree_util.tree_map(jnp.asarray, g)
    gpj = jax.tree_util.tree_map(jnp.asarray, gp)
    for layer, out_dim in [
        (AGNNConv(), F_IN),
        (PNAConv(F_IN, F_OUT), F_OUT),
    ]:
        out, params = layer.init_with_output(jax.random.key(0), gj.nodes, gj)
        assert out.shape == (N, out_dim)
        out_pad, _ = layer.init_with_output(jax.random.key(0), gpj.nodes, gpj)
        np.testing.assert_allclose(
            np.asarray(out_pad[:N]), np.asarray(out), rtol=1e-4, atol=1e-5
        )
