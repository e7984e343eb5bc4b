"""On-device scan trainers: loss must fall, metrics shapes must match, and
minibatch padding must stay balanced."""
import numpy as np
import jax
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.graph import from_edge_index
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.models.reorder_classifier import (
    ReorderClassifier,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.train.scan_trainer import (
    fullbatch_fit,
    make_padded_batches,
    minibatch_fit,
    pad_dataset,
)


def _graphs(rng, count=12):
    out = []
    for _ in range(count):
        n = int(rng.integers(5, 30))
        e = int(rng.integers(8, 60))
        x = np.zeros((n, 5), np.float32)
        x[:, 2:] = rng.normal(size=(n, 3))
        ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
        out.append(
            from_edge_index(
                x, ei, y=np.asarray([rng.integers(0, 4)], np.int64),
                globals=rng.uniform(1, 50, (1, 10)).astype(np.float32),
            )
        )
    return out


def test_fullbatch_fit_converges(rng):
    gs = _graphs(rng)
    tg = pad_dataset(gs, node_multiple=64, edge_multiple=128)
    model = ReorderClassifier(hidden=16)
    res = fullbatch_fit(model, tg, tg, epochs=40, learning_rate=3e-3, seed=0)
    assert res.losses.shape == (40,)
    assert res.val_accuracy.shape == (40,)
    assert res.losses[-1] < res.losses[0] / 2
    assert 0 <= res.best_val_accuracy <= 1
    assert res.best_val_accuracy >= res.val_accuracy.max() - 1e-6


def test_minibatch_fit_converges(rng):
    gs = _graphs(rng)
    sb = make_padded_batches(gs, 4, node_multiple=64, edge_multiple=128)
    assert sb.n_node.shape == (3, 5)  # 12 graphs / 4 -> 3 batches, 4+1 slots
    # every graph appears exactly once across batches
    assert int(np.sum(sb.n_node > 0)) == 12
    tg = pad_dataset(gs, node_multiple=64, edge_multiple=128)
    model = ReorderClassifier(hidden=16)
    res = minibatch_fit(model, sb, tg, epochs=15, learning_rate=3e-3, seed=0)
    assert res.losses.shape == (15,)
    assert res.losses[-1] < res.losses[0] / 2
