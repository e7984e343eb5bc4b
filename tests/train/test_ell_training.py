"""Equivalence: minibatch_fit with the ELL fast path == segment path."""
import numpy as np
import jax
import jax.numpy as jnp

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.graph import from_edge_index
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.models import ReorderClassifier
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.ell import (
    ell_pairs_for_batches,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.train.scan_trainer import (
    make_padded_batches,
    minibatch_fit,
    pad_dataset,
)


def test_ell_training_matches_segment_path(rng):
    def mk():
        n, e = int(rng.integers(6, 20)), int(rng.integers(10, 40))
        x = np.zeros((n, 5), np.float32)
        x[:, 2:] = rng.normal(size=(n, 3))
        ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
        return from_edge_index(
            x, ei, y=np.asarray([rng.integers(0, 4)], np.int64),
            globals=rng.uniform(1, 50, (1, 10)).astype(np.float32),
        )

    gs = [mk() for _ in range(12)]
    sb = make_padded_batches(gs, 4, node_multiple=64, edge_multiple=128)
    vg = pad_dataset(gs, node_multiple=64, edge_multiple=128)
    ells = ell_pairs_for_batches(sb, width=16)
    model = ReorderClassifier(hidden=16, dropout_rate=0.0)
    r1 = minibatch_fit(model, sb, vg, epochs=8, learning_rate=3e-3, seed=0)
    r2 = minibatch_fit(model, sb, vg, epochs=8, learning_rate=3e-3, seed=0, ells=ells)
    np.testing.assert_allclose(r1.losses, r2.losses, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(r1.val_accuracy, r2.val_accuracy, atol=1e-6)


def test_ell_training_with_stripped_coo(rng):
    def mk():
        n, e = int(rng.integers(6, 20)), int(rng.integers(10, 40))
        x = np.zeros((n, 5), np.float32)
        x[:, 2:] = rng.normal(size=(n, 3))
        ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
        return from_edge_index(
            x, ei, y=np.asarray([rng.integers(0, 4)], np.int64),
            globals=rng.uniform(1, 50, (1, 10)).astype(np.float32),
        )

    gs = [mk() for _ in range(8)]
    sb = make_padded_batches(gs, 4, node_multiple=64, edge_multiple=128)
    vg = pad_dataset(gs, node_multiple=64, edge_multiple=128)
    ells = ell_pairs_for_batches(sb, width=16)
    model = ReorderClassifier(hidden=16, dropout_rate=0.0)
    r1 = minibatch_fit(model, sb, vg, epochs=5, learning_rate=3e-3, seed=0, ells=ells)
    r2 = minibatch_fit(model, sb, vg, epochs=5, learning_rate=3e-3, seed=0,
                       ells=ells, strip_coo=True)
    np.testing.assert_allclose(r1.losses, r2.losses, rtol=1e-4, atol=1e-5)
