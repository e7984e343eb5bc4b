"""SPMD data-parallel + edge-sharded training tests on an 8-device CPU mesh.

The reference has *no* fake-backend distributed tests (its multi-GPU code is
excluded from coverage, ``.coveragerc:5-6``); here every parallel path is
exercised by equivalence against the serial step: DP over the data axis and
edge partitioning over the graph axis must reproduce single-device training
bit-for-bit (up to float tolerance).
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import stm_multifrontal_qr_factorization_empowered_by_gcn_tpu as stmgcn
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.batch import (
    batch_graphs,
    pad_graph,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.graph import from_edge_index
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.models.reorder_classifier import (
    ReorderClassifier,
    masked_accuracy,
    masked_nll_loss,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.parallel import (
    make_mesh,
    make_spmd_eval_step,
    make_spmd_train_step,
    stack_shards,
)


def _random_graph(rng, n, e, num_feats=5):
    x = rng.normal(size=(n, num_feats)).astype(np.float32)
    senders = rng.integers(0, n, size=e)
    receivers = rng.integers(0, n, size=e)
    return from_edge_index(
        x,
        np.stack([senders, receivers]),
        y=np.asarray([rng.integers(0, 4)], np.int64),
        globals=rng.uniform(1, 100, size=(1, 10)).astype(np.float32),
    )


def _padded_batch(rng, batch=2, n_pad=64, e_pad=128):
    gs = [
        _random_graph(rng, int(rng.integers(4, 20)), int(rng.integers(8, 40)))
        for _ in range(batch)
    ]
    return pad_graph(
        batch_graphs(gs), num_nodes=n_pad, num_edges=e_pad, num_graphs=batch + 1
    )


@pytest.mark.parametrize("data,graph", [(8, 1), (4, 2), (2, 4)])
def test_spmd_matches_serial_step(rng, data, graph):
    model = ReorderClassifier(hidden=16, dropout_rate=0.0)
    tx = optax.adam(1e-3)
    shards = [_padded_batch(rng) for _ in range(data)]
    stacked = stack_shards(shards)

    example = jax.tree_util.tree_map(jnp.asarray, shards[0])
    params = model.init(jax.random.key(0), example)
    opt_state = tx.init(params)

    mesh = make_mesh(data=data, graph=graph)
    step = make_spmd_train_step(
        model, tx, mesh, masked_nll_loss, has_dropout=False
    )
    p_spmd, _, loss_spmd = step(params, opt_state, stacked, jax.random.key(1))

    # serial reference: mean over shards of per-shard mean-NLL gradients
    def serial_loss(p):
        losses = [
            masked_nll_loss(
                model.apply(p, jax.tree_util.tree_map(jnp.asarray, s), train=True),
                s,
            )
            for s in shards
        ]
        return jnp.mean(jnp.stack(losses))

    loss_ref, grads_ref = jax.value_and_grad(serial_loss)(params)
    updates, _ = tx.update(grads_ref, opt_state, params)
    p_ref = optax.apply_updates(params, updates)

    assert np.allclose(float(loss_spmd), float(loss_ref), rtol=1e-5, atol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_spmd), jax.tree_util.tree_leaves(p_ref)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_spmd_eval_totals(rng):
    model = ReorderClassifier(hidden=16, dropout_rate=0.0)
    shards = [_padded_batch(rng) for _ in range(4)]
    stacked = stack_shards(shards)
    example = jax.tree_util.tree_map(jnp.asarray, shards[0])
    params = model.init(jax.random.key(0), example)

    mesh = make_mesh(data=4, graph=2)
    ev = make_spmd_eval_step(model, mesh, masked_accuracy)
    correct, total = ev(params, stacked)

    c_ref = t_ref = 0
    for s in shards:
        g = jax.tree_util.tree_map(jnp.asarray, s)
        c, t = masked_accuracy(model.apply(params, g, train=False), g)
        c_ref += int(c)
        t_ref += int(t)
    assert int(total) == t_ref == 8
    assert int(correct) == c_ref
