"""Norm layers, readouts, and model-zoo smoke/correctness tests."""
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.batch import (
    batch_graphs,
    pad_graph,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.graph import from_edge_index
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.glob import (
    GlobalAttention,
    Set2Set,
    global_sort_pool,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.models import (
    GAE,
    GraphUNet,
    JumpingKnowledge,
    LabelPropagation,
    Node2Vec,
    build_neighbor_table,
    inner_product_decode,
    random_walks,
    recon_loss,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.norm import (
    BatchNorm,
    GraphSizeNorm,
    InstanceNorm,
    LayerNorm,
    MessageNorm,
    PairNorm,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.pool import SAGPooling


def _two_graphs(rng, n1=7, n2=5, f=6):
    gs = []
    for n in (n1, n2):
        e = 2 * n
        x = rng.normal(size=(n, f)).astype(np.float32)
        ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
        gs.append(from_edge_index(x, ei))
    g = batch_graphs(gs)
    return pad_graph(g, num_nodes=16, num_edges=32, num_graphs=3), gs


def test_instance_norm_padding_invariant(rng):
    gp, gs = _two_graphs(rng)
    gj = jax.tree_util.tree_map(jnp.asarray, gp)
    layer = InstanceNorm(6)
    out, _ = layer.init_with_output(jax.random.key(0), gj.nodes, gj)
    # graph 0 rows must equal single-graph normalization of graph 0 alone
    x0 = jnp.asarray(gs[0].nodes)
    mean, var = x0.mean(0), x0.var(0)
    expect = (x0 - mean) / jnp.sqrt(var + 1e-5)
    np.testing.assert_allclose(np.asarray(out[:7]), np.asarray(expect), rtol=1e-4, atol=1e-4)
    assert np.all(np.asarray(out[12:]) == 0)  # padding rows zeroed


def test_batch_layer_pair_size_norms_shapes(rng):
    gp, _ = _two_graphs(rng)
    gj = jax.tree_util.tree_map(jnp.asarray, gp)
    x = gj.nodes
    for layer, args in [
        (BatchNorm(6), (x,)),
        (LayerNorm(6), (x, gj)),
        (PairNorm(), (x, gj)),
        (GraphSizeNorm(), (x, gj)),
    ]:
        out, _ = layer.init_with_output(jax.random.key(0), *args)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()
    mn = MessageNorm(learn_scale=True)
    out, _ = mn.init_with_output(jax.random.key(0), x, x * 2)
    assert out.shape == x.shape


def test_batchnorm_masked_stats(rng):
    x = rng.normal(size=(10, 4)).astype(np.float32)
    mask = np.zeros(10, bool)
    mask[:6] = True
    layer = BatchNorm(4, affine=False, track_running_stats=False)
    out, _ = layer.init_with_output(
        jax.random.key(0), jnp.asarray(x), node_mask=jnp.asarray(mask), train=True
    )
    ref = (x[:6] - x[:6].mean(0)) / np.sqrt(x[:6].var(0) + 1e-5)
    np.testing.assert_allclose(np.asarray(out[:6]), ref, rtol=1e-4, atol=1e-4)


def test_global_attention_set2set_sort(rng):
    gp, _ = _two_graphs(rng)
    gj = jax.tree_util.tree_map(jnp.asarray, gp)
    x = gj.nodes
    att = GlobalAttention(gate_nn=nn.Dense(1))
    out, _ = att.init_with_output(jax.random.key(0), x, gj)
    assert out.shape == (3, 6)
    s2s = Set2Set(6, processing_steps=2)
    out, _ = s2s.init_with_output(jax.random.key(0), x, gj)
    assert out.shape == (3, 12)
    out = global_sort_pool(x, gj, k=4)
    assert out.shape == (3, 24)
    assert np.isfinite(np.asarray(out)).all()
    # padding graph row must be zero
    assert np.all(np.asarray(out[2]) == 0)


def test_sag_pooling_counts(rng):
    gp, _ = _two_graphs(rng)
    gj = jax.tree_util.tree_map(jnp.asarray, gp)
    pool = SAGPooling(6, ratio=0.5)
    out, _ = pool.init_with_output(jax.random.key(0), gj)
    assert np.asarray(out.graph.n_node).tolist()[:2] == [4, 3]  # ceil(.5*7), ceil(.5*5)


def test_gae_recon_and_decode(rng):
    z = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
    pos = (jnp.asarray([0, 1, 2]), jnp.asarray([1, 2, 3]))
    neg = (jnp.asarray([0, 4]), jnp.asarray([5, 5]))
    p = inner_product_decode(z, *pos)
    assert p.shape == (3,) and (np.asarray(p) >= 0).all() and (np.asarray(p) <= 1).all()
    loss = recon_loss(z, *pos, *neg)
    assert np.isfinite(float(loss))
    enc = nn.Dense(4)
    gae = GAE(encoder=enc)
    out, _ = gae.init_with_output(jax.random.key(0), z)
    assert out.shape == (6, 4)


def test_jumping_knowledge_modes(rng):
    xs = [jnp.asarray(rng.normal(size=(5, 8)).astype(np.float32)) for _ in range(3)]
    for mode, dim in [("cat", 24), ("max", 8), ("lstm", 8)]:
        jk = JumpingKnowledge(mode=mode, channels=8)
        out, _ = jk.init_with_output(jax.random.key(0), xs)
        assert out.shape == (5, dim), mode


def test_label_propagation_converges_on_components(rng):
    # two disconnected cliques: labels must stay within components
    ei = np.asarray([[0, 1, 2, 0, 3, 4, 5, 3], [1, 0, 0, 2, 4, 3, 3, 5]])
    x = np.zeros((6, 2), np.float32)
    g = from_edge_index(np.zeros((6, 1), np.float32), ei)
    y = jnp.asarray([[1, 0], [0, 0], [0, 0], [0, 1], [0, 0], [0, 0]], jnp.float32)
    lp = LabelPropagation(num_layers=10, alpha=0.9)
    out = lp(y, jnp.asarray(g.senders), jnp.asarray(g.receivers), num_nodes=6)
    out = np.asarray(out)
    assert out[1, 0] > 0 and out[1, 1] == 0  # class 0 stays in component A
    assert out[4, 1] > 0 and out[4, 0] == 0


def test_graph_unet_smoke(rng):
    gp, _ = _two_graphs(rng)
    gj = jax.tree_util.tree_map(jnp.asarray, gp)
    unet = GraphUNet(6, 12, 3, depth=2)
    out, _ = unet.init_with_output(jax.random.key(0), gj)
    assert out.shape == (16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_node2vec_walks_and_loss(rng):
    ei = np.stack([rng.integers(0, 20, 80), rng.integers(0, 20, 80)])
    table = build_neighbor_table(ei[0], ei[1], 20, width=8)
    walks = random_walks(jax.random.key(0), table, jnp.arange(20), 6)
    assert walks.shape == (20, 7)
    w = np.asarray(walks)
    # every step is a real neighbor (or self for isolated nodes)
    tbl = np.asarray(table.neighbors)
    for i in range(20):
        for t in range(6):
            assert w[i, t + 1] in tbl[w[i, t]]
    n2v = Node2Vec(num_nodes=20, embedding_dim=8, walk_length=6, context_size=3)
    params = n2v.init(jax.random.key(0), jnp.arange(5))
    loss = n2v.apply(params, jax.random.key(1), table, jnp.arange(20), method=n2v.loss)
    assert np.isfinite(float(loss))


def test_argva_losses(rng):
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.models import (
        ARGVADiscriminator,
        argva_discriminator_loss,
        argva_reg_loss,
    )

    disc = ARGVADiscriminator(hidden=16)
    z = jnp.asarray(rng.normal(size=(20, 8)).astype(np.float32)) + 3.0
    prior = jnp.asarray(rng.normal(size=(20, 8)).astype(np.float32))
    params = disc.init(jax.random.key(0), z)
    dl = argva_discriminator_loss(disc.apply, params, z, prior)
    rl = argva_reg_loss(disc.apply, params, z)
    assert np.isfinite(float(dl)) and np.isfinite(float(rl))
    # training the discriminator must reduce its loss (z is shifted, separable)
    import optax
    tx = optax.adam(1e-2)
    opt = tx.init(params)
    @jax.jit
    def step(params, opt):
        l, g = jax.value_and_grad(
            lambda p: argva_discriminator_loss(disc.apply, p, z, prior)
        )(params)
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt, l
    l0 = None
    for i in range(60):
        params, opt, l = step(params, opt)
        l0 = l0 if l0 is not None else float(l)
    assert float(l) < l0 / 2


class TestDeepGCNLayer:
    """reference nn/models/deepgcn.py:6-106 block semantics."""

    def _setup(self):
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(12, 8)).astype(np.float32))
        s = jnp.asarray(rng.integers(0, 12, 30))
        r = jnp.asarray(rng.integers(0, 12, 30))
        return x, s, r

    def test_blocks_and_remat(self):
        import flax.linen as nn
        import jax
        import jax.numpy as jnp

        from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import GENConv
        from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.models import (
            DeepGCNLayer,
        )

        x, s, r = self._setup()

        class Net(nn.Module):
            block: str
            ckpt: bool

            @nn.compact
            def __call__(self, x, s, r):
                return DeepGCNLayer(
                    conv=GENConv(8, 8), norm=nn.LayerNorm(), act=nn.relu,
                    block=self.block, ckpt_grad=self.ckpt,
                )(x, s, r, num_nodes=12)

        outs = {}
        for block in ("res+", "res", "dense", "plain"):
            net = Net(block=block, ckpt=False)
            p = net.init(jax.random.key(0), x, s, r)
            out = net.apply(p, x, s, r)
            outs[block] = out
            # dense concatenates; others keep width
            assert out.shape[-1] == (16 if block == "dense" else 8)
            # remat path computes the same values and finite grads
            net_c = Net(block=block, ckpt=True)
            out_c = net_c.apply(p, x, s, r)
            np.testing.assert_allclose(np.asarray(out), np.asarray(out_c),
                                       atol=1e-6)
            g = jax.grad(lambda q: float(jnp.sum(net_c.apply(q, x, s, r) ** 2))
                         if False else jnp.sum(net_c.apply(q, x, s, r) ** 2))(p)
            assert np.isfinite(np.asarray(jax.tree_util.tree_leaves(g)[0])).all()
        # res+ differs from plain (skip connection present)
        assert not np.allclose(np.asarray(outs["res+"]), np.asarray(outs["plain"]))
