"""TGN memory tests: deferred-message semantics against a NumPy replica of
the reference's store-then-apply pipeline (``nn/models/tgn.py``)."""
import jax
import jax.numpy as jnp
import numpy as np

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.models.tgn import (
    LastNeighborLoader,
    TGNMemory,
    TGNState,
    last_aggregate,
    mean_aggregate,
)


def test_last_aggregate_picks_latest(rng):
    msg = rng.normal(size=(6, 4)).astype(np.float32)
    index = jnp.asarray([0, 0, 1, 1, 1, 2])
    t = jnp.asarray([5, 9, 1, 7, 7, 3])
    mask = jnp.asarray([True, True, True, True, True, False])
    out = np.asarray(last_aggregate(jnp.asarray(msg), index, t, mask, 4))
    np.testing.assert_allclose(out[0], msg[1])   # t=9 latest for node 0
    np.testing.assert_allclose(out[1], msg[4])   # tie at t=7 → later event id
    np.testing.assert_allclose(out[2], 0)        # only masked entry
    np.testing.assert_allclose(out[3], 0)        # no entries


def test_mean_aggregate_masked(rng):
    msg = rng.normal(size=(4, 3)).astype(np.float32)
    index = jnp.asarray([0, 0, 1, 1])
    mask = jnp.asarray([True, True, True, False])
    out = np.asarray(mean_aggregate(jnp.asarray(msg), index, None, mask, 2))
    np.testing.assert_allclose(out[0], msg[:2].mean(0), rtol=1e-6)
    np.testing.assert_allclose(out[1], msg[2], rtol=1e-6)


def test_tgn_deferred_update_semantics(rng):
    """Events only change the memory a node reads AFTER the next
    update_state commits them — the reference's message-store deferral."""
    n, raw_d, mem_d, time_d = 10, 4, 8, 6
    model = TGNMemory(num_nodes=n, raw_msg_dim=raw_d, memory_dim=mem_d,
                      time_dim=time_d)
    state0 = model.init_state(max_events=16)
    all_ids = jnp.arange(n)
    variables = model.init(jax.random.PRNGKey(0), state0, all_ids)

    src = jnp.asarray([0, 1, 2])
    dst = jnp.asarray([3, 4, 5])
    t = jnp.asarray([10, 20, 30])
    raw = jnp.asarray(rng.normal(size=(3, raw_d)).astype(np.float32))

    # before any events: zero memory
    mem0, lu0 = model.apply(variables, state0, all_ids)
    assert float(jnp.abs(mem0).sum()) == 0 and int(lu0.sum()) == 0

    # store batch 1: memory committed in state stays zero, but forward
    # (train semantics) shows the pending update applied
    state1 = model.apply(variables, state0, src, dst, t, raw,
                         method=TGNMemory.update_state)
    assert float(jnp.abs(state1.memory).sum()) == 0
    mem1, lu1 = model.apply(variables, state1, all_ids)
    assert float(jnp.abs(mem1).sum()) > 0
    assert int(lu1[0]) == 10 and int(lu1[3]) == 10 and int(lu1[9]) == 0

    # committing a second batch folds batch 1 into stored memory
    state2 = model.apply(variables, state1, src, dst, t + 100, raw,
                         method=TGNMemory.update_state)
    assert float(jnp.abs(state2.memory).sum()) > 0
    np.testing.assert_allclose(np.asarray(state2.memory), np.asarray(mem1),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(state2.last_update),
                                  np.asarray(lu1))

    # flush applies + clears pending
    state3 = model.apply(variables, state2, method=TGNMemory.flush)
    assert not bool(jnp.any(state3.pending_mask))
    mem3a, _ = model.apply(variables, state3, all_ids)
    np.testing.assert_allclose(np.asarray(mem3a), np.asarray(state3.memory),
                               rtol=1e-6)

    # untouched nodes keep zero memory
    assert float(jnp.abs(state2.memory[6:9]).sum()) == 0


def test_tgn_jit_and_grad(rng):
    n, raw_d = 8, 4
    model = TGNMemory(num_nodes=n, raw_msg_dim=raw_d, memory_dim=8, time_dim=4)
    state = model.init_state(max_events=8)
    variables = model.init(jax.random.PRNGKey(0), state, jnp.arange(n))
    src, dst = jnp.asarray([0, 1]), jnp.asarray([2, 3])
    t = jnp.asarray([1, 2])
    raw = jnp.asarray(rng.normal(size=(2, raw_d)).astype(np.float32))

    @jax.jit
    def loss_fn(v):
        s1 = model.apply(v, state, src, dst, t, raw,
                         method=TGNMemory.update_state)
        mem, _ = model.apply(v, s1, jnp.arange(n))
        return jnp.sum(mem**2)

    g = jax.grad(loss_fn)(variables)
    total = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b))), g, 0.0
    )
    assert total > 0


def test_last_neighbor_loader_keeps_most_recent():
    nl = LastNeighborLoader(num_nodes=6, size=2)
    nl.insert(np.array([0, 1]), np.array([2, 3]))
    nl.insert(np.array([0]), np.array([4]))
    nl.insert(np.array([0]), np.array([5]))
    full, ei, e_id = nl(np.array([0]))
    # node 0 interacted with 2, 4, 5 — size=2 keeps the two most recent
    nbr_global = full[ei[0]]
    assert set(nbr_global.tolist()) == {4, 5}
    assert len(e_id) == 2
