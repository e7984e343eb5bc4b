"""Activation parity with loaded reference weights (BASELINE.md target).

Ports ``graphmodel_ep5000.torch`` (reference ``testgraph.py:90``) with
``tools/port_reference_weights.py`` and asserts per-layer allclose between

* this framework's ``ReorderClassifier`` (strict-parity config:
  ``readout='max'``, ``log_exinfo=False``) and
* an independent re-computation of the reference ``Net`` forward
  (``GCN_classifier/testgraph.py:50-84``) in pure torch — GraphConv per
  ``torch_geometric/nn/conv/graph_conv.py:55-79``:
  ``out = lin_l(scatter_add(x_j)) + lin_r(x_i)``.
"""
import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tools"))

REF_CKPT = "/root/reference/GCN_classifier/models/graphmodel_ep5000.torch"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not osp.exists(REF_CKPT), reason="reference checkpoint not present"
)


@pytest.fixture(scope="module")
def fixture_graph():
    rng = np.random.default_rng(7)
    n, e = 60, 240
    senders = rng.integers(0, n, size=e).astype(np.int32)
    receivers = rng.integers(0, n, size=e).astype(np.int32)
    # Classorder node table [graph_id, row, out_deg, in_deg, elim_fill];
    # the model consumes columns 2:5 (reference graphclass.py:82)
    x = rng.random(size=(n, 5)).astype(np.float32)
    exinfo = rng.random(size=(1, 10)).astype(np.float32)
    return n, e, senders, receivers, x, exinfo


@pytest.fixture(scope="module")
def ported():
    from port_reference_weights import port_reference_params, reference_state_dict

    return port_reference_params(REF_CKPT), reference_state_dict(REF_CKPT)


def _torch_reference_forward(sd, senders, receivers, x, exinfo):
    """Reference Net.forward at eval time, straight from the math."""
    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    xs = torch.from_numpy(x[:, 2:5])
    s = torch.from_numpy(senders.astype(np.int64))
    r = torch.from_numpy(receivers.astype(np.int64))

    def graph_conv(prefix, h):
        agg = torch.zeros_like(h).index_add_(0, r, h[s])
        out = agg @ t[f"{prefix}.lin_l.weight"].T + t[f"{prefix}.lin_l.bias"]
        return out + h @ t[f"{prefix}.lin_r.weight"].T

    acts = {}
    acts["conv1"] = graph_conv("conv1", xs)
    x1 = torch.relu(acts["conv1"])
    acts["conv2"] = graph_conv("conv2", x1)
    x2 = torch.relu(acts["conv2"])
    pooled = torch.cat([x1, x2], dim=-1).max(dim=0).values[None]
    z = torch.cat([pooled, torch.from_numpy(exinfo)], dim=-1)
    acts["lin1"] = z @ t["lin1.weight"].T + t["lin1.bias"]
    z = torch.relu(acts["lin1"])
    acts["lin2"] = z @ t["lin2.weight"].T + t["lin2.bias"]
    z = torch.relu(acts["lin2"])
    acts["lin3"] = z @ t["lin3.weight"].T + t["lin3.bias"]
    acts["out"] = torch.log_softmax(acts["lin3"], dim=-1)
    return {k: v.numpy() for k, v in acts.items()}


def _jax_forward(params, n, e, senders, receivers, x, exinfo):
    import jax.numpy as jnp

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.graph import Graph
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.models.reorder_classifier import (
        ReorderClassifier,
    )

    g = Graph(
        nodes=jnp.asarray(x),
        senders=jnp.asarray(senders),
        receivers=jnp.asarray(receivers),
        n_node=jnp.asarray([n], jnp.int32),
        n_edge=jnp.asarray([e], jnp.int32),
        globals=jnp.asarray(exinfo),
    )
    model = ReorderClassifier(readout="max", log_exinfo=False)
    out, state = model.apply(params, g, capture_intermediates=True, mutable=["intermediates"])
    inter = state["intermediates"]

    def grab(name):
        return np.asarray(inter[name]["__call__"][0])

    return {
        "conv1": grab("conv1"),
        "conv2": grab("conv2"),
        "lin1": grab("lin1"),
        "lin2": grab("lin2"),
        "lin3": grab("lin3"),
        "out": np.asarray(out),
    }


def test_per_layer_activation_parity(fixture_graph, ported):
    n, e, senders, receivers, x, exinfo = fixture_graph
    params, sd = ported
    ref = _torch_reference_forward(sd, senders, receivers, x, exinfo)
    ours = _jax_forward(params, n, e, senders, receivers, x, exinfo)
    for name in ["conv1", "conv2", "lin1", "lin2", "lin3", "out"]:
        np.testing.assert_allclose(
            ours[name], ref[name], atol=1e-5, rtol=1e-5,
            err_msg=f"layer {name} diverges from reference activations",
        )


def test_prediction_parity_multigraph(fixture_graph, ported):
    """Batched padded forward (2 graphs + padding) must reproduce the same
    per-graph log-probs as the reference's one-graph-at-a-time evaluation."""
    import jax.numpy as jnp

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.graph import Graph
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.models.reorder_classifier import (
        ReorderClassifier,
    )

    n, e, senders, receivers, x, exinfo = fixture_graph
    params, sd = ported
    rng = np.random.default_rng(11)
    n2, e2 = 40, 150
    s2 = rng.integers(0, n2, size=e2).astype(np.int32)
    r2 = rng.integers(0, n2, size=e2).astype(np.int32)
    x2 = rng.random(size=(n2, 5)).astype(np.float32)
    ex2 = rng.random(size=(1, 10)).astype(np.float32)

    n_pad, e_pad, g_pad = 128, 512, 3
    nodes = np.zeros((n_pad, 5), np.float32)
    nodes[:n] = x
    nodes[n : n + n2] = x2
    ss = np.full(e_pad, n_pad - 1, np.int32)
    rr = np.full(e_pad, n_pad - 1, np.int32)
    ss[:e], rr[:e] = senders, receivers
    ss[e : e + e2], rr[e : e + e2] = s2 + n, r2 + n
    gl = np.zeros((g_pad, 10), np.float32)
    gl[0], gl[1] = exinfo[0], ex2[0]

    g = Graph(
        nodes=jnp.asarray(nodes),
        senders=jnp.asarray(ss),
        receivers=jnp.asarray(rr),
        n_node=jnp.asarray([n, n2, 0], jnp.int32),
        n_edge=jnp.asarray([e, e2, 0], jnp.int32),
        globals=jnp.asarray(gl),
    )
    model = ReorderClassifier(readout="max", log_exinfo=False)
    out = np.asarray(model.apply(params, g))

    ref1 = _torch_reference_forward(sd, senders, receivers, x, exinfo)["out"]
    ref2 = _torch_reference_forward(sd, s2, r2, x2, ex2)["out"]
    np.testing.assert_allclose(out[0], ref1[0], atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(out[1], ref2[0], atol=1e-5, rtol=1e-5)
