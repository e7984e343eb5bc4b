"""GatedGraphConv parity (reference
``torch_geometric/nn/conv/gated_graph_conv.py``): the propagate wiring and
per-layer weights are re-derived in numpy; the GRU cell itself is applied via
the same flax ``GRUCell`` with the extracted parameters (testing our layer's
message/aggregate plumbing, not reimplementing flax's GRU math)."""
import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import GatedGraphConv


def test_gated_graph_matches_reference_recurrence(small_graph):
    s, r, x = small_graph
    f, layers = 10, 2
    layer = GatedGraphConv(out_channels=f, num_layers=layers)
    params = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
        num_nodes=4,
    )
    got = np.asarray(
        layer.apply(params, jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                    num_nodes=4)
    )
    p = params["params"]
    gru = nn.GRUCell(features=f)
    gru_params = {"params": p["GRUCell_0"]}

    h = np.pad(x, [(0, 0), (0, f - x.shape[1])]).astype(np.float32)
    for k in range(layers):
        hw = h @ np.asarray(p[f"weight_{k}"])
        m = np.zeros_like(hw)
        np.add.at(m, r, hw[s])
        h, _ = gru.apply(gru_params, jnp.asarray(h), jnp.asarray(m))
        h = np.asarray(h)
    np.testing.assert_allclose(got, h, atol=1e-5)


def test_gated_graph_rejects_wide_input(small_graph):
    s, r, x = small_graph
    layer = GatedGraphConv(out_channels=4, num_layers=1)
    try:
        layer.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(s),
                   jnp.asarray(r), num_nodes=4)
        raised = False
    except ValueError:
        raised = True
    assert raised, "input wider than out_channels must raise (reference check)"
