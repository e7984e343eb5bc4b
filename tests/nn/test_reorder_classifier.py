"""Flagship model tests: shapes, masked loss, training decreases loss,
checkpoint round-trip (the reference's e2e 'test' is its training log)."""
import jax
import jax.numpy as jnp
import numpy as np

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data import (
    DataLoader,
    Graph,
    batch_graphs,
    from_edge_index,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.models import (
    MLPBaseline,
    ReorderClassifier,
    masked_accuracy,
    masked_nll_loss,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.train import Trainer


class ListDataset(list):
    pass


def make_dataset(rng, num=8):
    graphs = []
    for i in range(num):
        n = int(rng.integers(6, 20))
        e = 3 * n
        tab = np.zeros((n, 5), np.float32)
        tab[:, 0] = i
        tab[:, 1] = np.arange(n)
        tab[:, 2:5] = rng.random((n, 3))
        ei = rng.integers(0, n, size=(2, e)).astype(np.int32)
        g = from_edge_index(tab, ei, y=np.array([i % 4], np.int32))
        g = g.replace(globals=rng.random((1, 10)).astype(np.float32) * 100)
        graphs.append(g)
    return ListDataset(graphs)


def test_forward_shapes(rng):
    ds = make_dataset(rng)
    loader = DataLoader(ds, 4)
    g = jax.tree_util.tree_map(jnp.asarray, next(iter(loader)))
    model = ReorderClassifier()
    params = model.init(jax.random.key(0), g)
    out = model.apply(params, g)
    assert out.shape == (5, 4)  # batch 4 + 1 pad graph slot
    # log-softmax rows sum to 1
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(-1), 1.0, rtol=1e-5)


def test_padding_does_not_change_valid_logits(rng):
    ds = make_dataset(rng, 4)
    small = DataLoader(ds, 4, node_multiple=128)
    big = DataLoader(ds, 4, node_multiple=512, edge_multiple=2048)
    g1 = jax.tree_util.tree_map(jnp.asarray, next(iter(small)))
    g2 = jax.tree_util.tree_map(jnp.asarray, next(iter(big)))
    model = ReorderClassifier()
    params = model.init(jax.random.key(0), g1)
    o1 = model.apply(params, g1)[:4]
    o2 = model.apply(params, g2)[:4]
    np.testing.assert_allclose(o1, o2, rtol=1e-4, atol=1e-5)


def test_training_decreases_loss_and_ckpt_roundtrip(rng, tmp_path):
    ds = make_dataset(rng, 8)
    loader = DataLoader(ds, 4, shuffle=True)
    trainer = Trainer(ReorderClassifier(), learning_rate=1e-2)
    trainer.init(next(iter(loader)))
    first = trainer.train_epoch(loader)
    for _ in range(20):
        last = trainer.train_epoch(loader)
    assert last < first * 0.7

    path = str(tmp_path / "ck.msgpack")
    trainer.save(path)
    c0, t0 = trainer.evaluate(loader)
    t2 = Trainer(ReorderClassifier(), learning_rate=1e-2)
    t2.restore(path, example=next(iter(loader)))
    c1, t1 = t2.evaluate(loader)
    assert (c0, t0) == (c1, t1)
    assert t2.step_count == trainer.step_count


def test_mlp_baseline_runs(rng):
    ds = make_dataset(rng, 4)
    loader = DataLoader(ds, 4)
    g = jax.tree_util.tree_map(jnp.asarray, next(iter(loader)))
    model = MLPBaseline()
    params = model.init(jax.random.key(0), g)
    out = model.apply(params, g)
    assert out.shape == (5, 4)


def test_masked_loss_ignores_pad_graphs(rng):
    ds = make_dataset(rng, 4)
    loader = DataLoader(ds, 4)
    g = jax.tree_util.tree_map(jnp.asarray, next(iter(loader)))
    logp = jnp.log(jnp.full((5, 4), 0.25))
    # poison the pad row — loss must not change
    logp2 = logp.at[4].set(jnp.array([-100.0, -100.0, -100.0, -100.0]))
    np.testing.assert_allclose(masked_nll_loss(logp, g), masked_nll_loss(logp2, g))
    c, t = masked_accuracy(logp, g)
    assert int(t) == 4
