"""Scanned sampled-subgraph trainer: bit-parity with the per-batch
NeighborSampler loop under the same key discipline, and learning."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.data.sampler import (
    NeighborSampler,
    sample_fanout,
)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import SAGEConv
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.train import (
    make_scanned_sampled_trainer,
)

import flax.linen as fnn


N, F, C = 64, 8, 4
FANOUTS = [3, 2]
BATCH = 8


class TinySAGE(fnn.Module):
    @fnn.compact
    def __call__(self, h, blocks):
        dims = [16, C]
        for i, (blk, d) in enumerate(zip(blocks, dims)):
            h_dst = h[: blk.num_dst]
            h = SAGEConv((h.shape[-1], h.shape[-1]), d, name=f"conv{i}")(
                (h, h_dst), blk)
            if i < len(dims) - 1:
                h = fnn.relu(h)
        return jax.nn.log_softmax(h)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    E = 256
    s = rng.integers(0, N, E)
    r = rng.integers(0, N, E)
    x = rng.normal(size=(N, F)).astype(np.float32)
    y = rng.integers(0, C, N)
    sampler = NeighborSampler(s, r, N, FANOUTS, batch_size=BATCH,
                              shuffle=True, seed=3)
    model = TinySAGE()
    return sampler, model, jnp.asarray(x), jnp.asarray(y)


def _loss_fn(model):
    def loss(params, blocks, seeds, xj, yj):
        logp = model.apply(params, xj[blocks[0].src_ids], blocks)
        return -jnp.mean(
            jnp.take_along_axis(logp, yj[seeds][:, None], 1))

    return loss


def test_scan_matches_per_batch_loop(setup):
    sampler, model, xj, yj = setup
    tx = optax.sgd(1e-2)
    seeds0 = jnp.asarray(sampler.seed_batches(0))
    key0 = jax.random.key(42)

    loss = _loss_fn(model)
    blocks0 = sample_fanout(jax.random.split(key0)[1], sampler.table,
                            seeds0[0], FANOUTS)
    params = model.init(jax.random.key(0), xj[blocks0[0].src_ids], blocks0)
    opt = tx.init(params)

    # per-batch reference loop with the SAME key discipline
    p_ref, o_ref, key = params, opt, key0
    losses_ref = []
    for i in range(seeds0.shape[0]):
        key, sub = jax.random.split(key)
        blocks = sample_fanout(sub, sampler.table, seeds0[i], FANOUTS)
        l, g = jax.value_and_grad(loss)(p_ref, blocks, seeds0[i], xj, yj)
        u, o_ref = tx.update(g, o_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, u)
        losses_ref.append(float(l))

    epoch_fn = make_scanned_sampled_trainer(loss, tx, sampler.table, FANOUTS)
    p_scan, o_scan, _, losses = epoch_fn(params, opt, key0, seeds0, xj, yj)

    np.testing.assert_allclose(np.asarray(losses), losses_ref, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_scan),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_scan_learns(setup):
    sampler, model, xj, yj = setup
    tx = optax.adam(1e-2)
    loss = _loss_fn(model)
    seeds0 = jnp.asarray(sampler.seed_batches(0))
    key = jax.random.key(7)
    blocks0 = sample_fanout(key, sampler.table, seeds0[0], FANOUTS)
    params = model.init(jax.random.key(0), xj[blocks0[0].src_ids], blocks0)
    opt = tx.init(params)
    epoch_fn = make_scanned_sampled_trainer(loss, tx, sampler.table, FANOUTS)
    first = None
    for ep in range(15):
        seeds = jnp.asarray(sampler.seed_batches(ep))
        params, opt, key, losses = epoch_fn(params, opt, key, seeds, xj, yj)
        if first is None:
            first = float(losses[0])
    assert float(losses[-1]) < first * 0.7


def test_seed_batches_shape(setup):
    sampler, *_ = setup
    sb = sampler.seed_batches(0)
    assert sb.shape == (len(sampler), BATCH)
    assert sb.dtype == np.int32
    # different epochs shuffle differently
    assert not np.array_equal(sb, sampler.seed_batches(1))


def test_dp_scan_epoch(setup):
    """DP trainer on a 4-device mesh: grads psum-averaged every step ==
    a single-device step on the concatenated global batch (one-step
    parity), and multi-epoch training learns."""
    from jax.sharding import Mesh
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.train import (
        make_dp_scanned_sampled_trainer,
    )

    sampler, model, xj, yj = setup
    tx = optax.sgd(1e-2)
    loss = _loss_fn(model)
    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("data",))

    seeds0 = jnp.asarray(sampler.seed_batches(0))   # [nb, 8]
    key0 = jax.random.key(5)
    blocks0 = sample_fanout(key0, sampler.table, seeds0[0], FANOUTS)
    params = model.init(jax.random.key(0), xj[blocks0[0].src_ids], blocks0)
    opt = tx.init(params)

    epoch_fn = make_dp_scanned_sampled_trainer(
        loss, tx, sampler.table, FANOUTS, mesh)

    # one-step parity: manually average the 4 shard grads
    one = seeds0[:1]
    p1, o1, _, l1 = epoch_fn(params, opt, key0, one, xj, yj)
    gsum = None
    ls = []
    for d in range(4):
        sub = jax.random.split(
            jax.random.fold_in(key0, d))[1]
        shard = one[0].reshape(4, 2)[d]
        blocks = sample_fanout(sub, sampler.table, shard, FANOUTS)
        l, g = jax.value_and_grad(loss)(params, blocks, shard, xj, yj)
        ls.append(float(l))
        g = jax.tree_util.tree_map(lambda x: x / 4.0, g)
        gsum = g if gsum is None else jax.tree_util.tree_map(
            jnp.add, gsum, g)
    u, _ = tx.update(gsum, opt, params)
    p_ref = optax.apply_updates(params, u)
    np.testing.assert_allclose(float(l1[0]), np.mean(ls), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # learning over epochs
    key = key0
    first = None
    for ep in range(12):
        seeds = jnp.asarray(sampler.seed_batches(ep))
        params, opt, key, losses = epoch_fn(params, opt, key, seeds, xj, yj)
        if first is None:
            first = float(losses[0])
    assert float(losses[-1]) < first
