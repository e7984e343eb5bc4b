"""Per-conv dense-parity tests for the final conv batch (reference pattern
``test/nn/conv/test_{cg,gen,mf,ppf,rgcn,wl}_conv.py``): NumPy replicas of the
reference math on a fixed tiny graph."""
import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.graph import (
    from_edge_index,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.conv import (
    CGConv,
    GENConv,
    MFConv,
    PPFConv,
    RGCNConv,
    WLConv,
)

N, E, F = 6, 10, 8


def _graph(rng, edge_dim=None):
    x = rng.normal(size=(N, F)).astype(np.float32)
    ei = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)])
    ea = (
        rng.normal(size=(E, edge_dim)).astype(np.float32)
        if edge_dim
        else None
    )
    return x, ei, ea, from_edge_index(x, ei, edge_attr=ea)


def _softplus(v):
    return np.log1p(np.exp(-np.abs(v))) + np.maximum(v, 0)


def test_cg_conv_parity(rng):
    x, ei, ea, g = _graph(rng, edge_dim=3)
    layer = CGConv(F, dim=3)
    variables = layer.init(jax.random.PRNGKey(0), x, g)
    out = np.asarray(layer.apply(variables, x, g))
    p = variables["params"]
    wf, bf = np.asarray(p["lin_f"]["kernel"]), np.asarray(p["lin_f"]["bias"])
    ws, bs = np.asarray(p["lin_s"]["kernel"]), np.asarray(p["lin_s"]["bias"])
    ref = x.copy()
    for s, r, e in zip(ei[0], ei[1], ea):
        z = np.concatenate([x[r], x[s], e])
        ref[r] += (1 / (1 + np.exp(-(z @ wf + bf)))) * _softplus(z @ ws + bs)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_gen_conv_softmax_parity(rng):
    x, ei, _, g = _graph(rng)
    layer = GENConv(F, 12, aggr="softmax", t=1.3)
    variables = layer.init(jax.random.PRNGKey(1), x, g)
    out = np.asarray(layer.apply(variables, x, g))
    p = variables["params"]
    # replica: msg = relu(x_j) + eps; softmax over receivers weighted sum
    eps = 1e-7
    msg = np.maximum(x[ei[0]], 0) + eps
    agg = np.zeros_like(x)
    for v in range(N):
        m = ei[1] == v
        if m.any():
            logits = msg[m] * 1.3
            a = np.exp(logits - logits.max(0, keepdims=True))
            a = a / a.sum(0, keepdims=True)
            agg[v] = (msg[m] * a).sum(0)
    h = agg + x
    h = h @ np.asarray(p["mlp_0"]["kernel"]) + np.asarray(p["mlp_0"]["bias"])
    mu = h.mean(-1, keepdims=True)
    var = h.var(-1, keepdims=True)
    h = (h - mu) / np.sqrt(var + 1e-6)
    h = h * np.asarray(p["mlp_norm_0"]["scale"]) + np.asarray(
        p["mlp_norm_0"]["bias"]
    )
    h = np.maximum(h, 0)
    ref = h @ np.asarray(p["mlp_1"]["kernel"]) + np.asarray(p["mlp_1"]["bias"])
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)
    # power-mean variant runs and differs
    layer_p = GENConv(F, 12, aggr="power", p=2.0)
    vp = layer_p.init(jax.random.PRNGKey(2), x, g)
    out_p = np.asarray(layer_p.apply(vp, x, g))
    assert out_p.shape == (N, 12) and np.isfinite(out_p).all()


def test_mf_conv_parity(rng):
    x, ei, _, g = _graph(rng)
    layer = MFConv(F, 5, max_degree=3)
    variables = layer.init(jax.random.PRNGKey(3), x, g)
    out = np.asarray(layer.apply(variables, x, g))
    p = variables["params"]
    wl = np.asarray(p["lins_l"])
    bl = np.asarray(p["lins_l_bias"])
    wr = np.asarray(p["lins_r"])
    deg = np.bincount(ei[1], minlength=N).clip(max=3)
    h = np.zeros_like(x)
    np.add.at(h, ei[1], x[ei[0]])
    ref = np.stack(
        [h[v] @ wl[deg[v]] + bl[deg[v]] + x[v] @ wr[deg[v]] for v in range(N)]
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_ppf_conv_invariance_and_shape(rng):
    x, ei, _, g = _graph(rng)
    pos = rng.normal(size=(N, 3)).astype(np.float32)
    nrm = rng.normal(size=(N, 3))
    nrm = (nrm / np.linalg.norm(nrm, axis=1, keepdims=True)).astype(np.float32)

    class LNN(fnn.Module):
        @fnn.compact
        def __call__(self, v):
            return fnn.Dense(12)(v)

    layer = PPFConv(local_nn=LNN())
    variables = layer.init(
        jax.random.PRNGKey(4), jnp.asarray(x), jnp.asarray(pos),
        jnp.asarray(nrm), g,
    )
    out = np.asarray(
        layer.apply(variables, jnp.asarray(x), jnp.asarray(pos),
                    jnp.asarray(nrm), g)
    )
    assert out.shape == (N, 12)
    # rotation invariance of the PPF features
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    out2 = np.asarray(
        layer.apply(variables, jnp.asarray(x),
                    jnp.asarray((pos @ q.T).astype(np.float32)),
                    jnp.asarray((nrm @ q.T).astype(np.float32)), g)
    )
    np.testing.assert_allclose(out, out2, rtol=1e-3, atol=1e-4)


def test_rgcn_conv_parity_and_basis(rng):
    x, ei, _, g = _graph(rng)
    et = rng.integers(0, 3, E)
    layer = RGCNConv(F, 7, num_relations=3, aggr="mean")
    variables = layer.init(jax.random.PRNGKey(5), x, g, edge_type=jnp.asarray(et))
    out = np.asarray(layer.apply(variables, x, g, edge_type=jnp.asarray(et)))
    p = variables["params"]
    w = np.asarray(p["weight"])
    root = np.asarray(p["root"])
    bias = np.asarray(p["bias"])
    ref = x @ root + bias
    for rel in range(3):
        agg = np.zeros_like(x)
        cnt = np.zeros(N)
        for s, r, t in zip(ei[0], ei[1], et):
            if t == rel:
                agg[r] += x[s]
                cnt[r] += 1
        agg = agg / np.maximum(cnt, 1)[:, None]
        ref = ref + agg @ w[rel]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    # basis decomposition shares weights through comp
    lb = RGCNConv(F, 7, num_relations=3, num_bases=2)
    vb = lb.init(jax.random.PRNGKey(6), x, g, edge_type=jnp.asarray(et))
    assert np.asarray(vb["params"]["weight"]).shape == (2, F, 7)
    ob = np.asarray(lb.apply(vb, x, g, edge_type=jnp.asarray(et)))
    assert ob.shape == (N, 7) and np.isfinite(ob).all()
    # block diagonal
    lk = RGCNConv(F, 6, num_relations=3, num_blocks=2)
    vk = lk.init(jax.random.PRNGKey(7), x, g, edge_type=jnp.asarray(et))
    ok = np.asarray(lk.apply(vk, x, g, edge_type=jnp.asarray(et)))
    assert ok.shape == (N, 6) and np.isfinite(ok).all()


def test_wl_conv_refinement():
    # two triangles + one path: WL colors must separate by structure
    ei = np.array(
        [[0, 1, 1, 2, 2, 0, 3, 4, 4, 5, 5, 3, 6, 7],
         [1, 0, 2, 1, 0, 2, 4, 3, 5, 4, 3, 5, 7, 6]]
    )
    x = np.zeros(8, np.int64)
    wl = WLConv()
    c1 = wl(x, ei[0], ei[1], num_nodes=8)
    # triangle nodes (deg 2, two same-color nbrs) vs path nodes (deg 1)
    assert len(set(c1[:6].tolist())) == 1
    assert len(set(c1[6:].tolist())) == 1
    assert c1[0] != c1[6]
    hist = wl.histogram(c1, graph_ids=np.array([0, 0, 0, 1, 1, 1, 2, 2]))
    assert hist.shape[0] == 3
    np.testing.assert_allclose(hist[0], hist[1])
