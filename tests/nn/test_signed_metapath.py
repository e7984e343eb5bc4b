"""SignedGCN + MetaPath2Vec model tests (reference
``test/nn/models/test_signed_gcn.py`` / ``test_metapath2vec.py`` contracts)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.models.metapath2vec import (
    MetaPath2Vec,
    build_metapath_tables,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.models.signed_gcn import (
    SignedGCN,
    create_spectral_features,
    signed_gcn_test,
    split_edges,
)


def _signed_graph(rng, n=30, e=120):
    ei = rng.integers(0, n, size=(2, e))
    ei = ei[:, ei[0] != ei[1]]
    half = ei.shape[1] // 2
    return ei[:, :half], ei[:, half:]


def test_signed_gcn_shapes_and_loss_decreases(rng):
    n = 30
    pos_ei, neg_ei = _signed_graph(rng, n)
    x = create_spectral_features(pos_ei, neg_ei, n, dim=8)
    assert x.shape == (n, 8)

    model = SignedGCN(8, 16, num_layers=2, lamb=5.0)
    pe = (jnp.asarray(pos_ei[0]), jnp.asarray(pos_ei[1]))
    ne = (jnp.asarray(neg_ei[0]), jnp.asarray(neg_ei[1]))
    xj = jnp.asarray(x)
    variables = model.init(
        jax.random.PRNGKey(0), xj, pe, ne, method=SignedGCN.init_all
    )
    z = model.apply(variables, xj, pe, ne)
    assert z.shape == (n, 16)

    tx = optax.adam(1e-2)
    opt = tx.init(variables)

    @jax.jit
    def step(v, o, key):
        def loss_fn(v):
            z = model.apply(v, xj, pe, ne)
            return model.apply(v, key, z, pe, ne, method=SignedGCN.loss)

        l, g = jax.value_and_grad(loss_fn)(v)
        up, o = tx.update(g, o)
        return optax.apply_updates(v, up), o, l

    losses = []
    for i in range(100):
        variables, opt, l = step(variables, opt, jax.random.PRNGKey(i))
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.8

    z = model.apply(variables, xj, pe, ne)
    auc, f1 = signed_gcn_test(model, variables, z, pos_ei, neg_ei)
    assert 0.0 <= auc <= 1.0 and 0.0 <= f1 <= 1.0
    # trained on these edges — must beat chance with margin (hard-argmax AUC
    # is a coarse statistic on 60 edges; 0.5 exactly would be chance)
    assert auc >= 0.55


def test_split_edges_disjoint():
    ei = np.stack([np.arange(50), np.roll(np.arange(50), 1)])
    tr, te = split_edges(ei, test_ratio=0.2, seed=1)
    assert tr.shape[1] + te.shape[1] == 50
    assert te.shape[1] == 10


@pytest.fixture
def hetero():
    # bipartite author<->paper metapath ("a","writes","p"), ("p","written","a")
    rng = np.random.default_rng(0)
    na, np_ = 12, 20
    ap = np.stack([rng.integers(0, na, 60), rng.integers(0, np_, 60)])
    pa = ap[::-1]
    edge_index_dict = {
        ("a", "writes", "p"): ap,
        ("p", "written", "a"): pa,
    }
    return edge_index_dict, {"a": na, "p": np_}


def test_metapath2vec_walk_types_and_loss(hetero, rng):
    eid, nnd = hetero
    metapath = (("a", "writes", "p"), ("p", "written", "a"))
    model = MetaPath2Vec(
        num_nodes_dict=nnd, metapath=metapath, embedding_dim=16,
        walk_length=4, context_size=3, walks_per_node=2,
    )
    tables = build_metapath_tables(eid, nnd, metapath)
    starts = jnp.arange(nnd["a"])
    variables = model.init(jax.random.PRNGKey(0), "a")

    pos = model.apply(
        variables, jax.random.PRNGKey(1), tables, starts,
        method=MetaPath2Vec.pos_walks,
    )
    neg = model.apply(
        variables, jax.random.PRNGKey(2), starts, method=MetaPath2Vec.neg_walks
    )
    assert pos.shape[1] == 3 and neg.shape[1] == 3
    # packed ids must respect type ranges: "a" ids in [0, na), "p" in [na, na+np)
    na = nnd["a"]
    total = na + nnd["p"]
    assert int(pos.min()) >= 0 and int(pos.max()) < total
    # walk alternates a, p, a, p, a → windows starting at even positions
    # begin with an "a" id (reference offset packing)
    full_windows = np.asarray(pos).reshape(-1, pos.shape[1])
    assert ((full_windows >= 0) & (full_windows < total)).all()

    emb = model.apply(variables, "a")
    assert emb.shape == (na, 16)

    tx = optax.adam(5e-2)
    opt = tx.init(variables)

    @jax.jit
    def step(v, o, key):
        k1, k2 = jax.random.split(key)

        def loss_fn(v):
            pos = model.apply(v, k1, tables, starts, method=MetaPath2Vec.pos_walks)
            neg = model.apply(v, k2, starts, method=MetaPath2Vec.neg_walks)
            return model.apply(v, pos, neg, method=MetaPath2Vec.loss)

        l, g = jax.value_and_grad(loss_fn)(v)
        up, o = tx.update(g, o)
        return optax.apply_updates(v, up), o, l

    losses = []
    for i in range(30):
        variables, opt, l = step(variables, opt, jax.random.PRNGKey(100 + i))
        losses.append(float(l))
    assert losses[-1] < losses[0]
