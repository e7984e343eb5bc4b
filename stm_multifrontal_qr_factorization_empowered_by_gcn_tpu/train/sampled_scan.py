"""On-device scanned sampled-subgraph training.

The reference's sampled-SAGE flow (``examples/reddit.py``,
``examples/multi_gpu/distributed_sampling.py:61-114``) runs CPU sampling
workers and dispatches one optimizer step per minibatch — dozens of
host→device round trips per epoch.  On TPU the fanout sampler is itself a
fixed-shape jittable program (:func:`~..data.sampler.sample_fanout`), so
the whole epoch — sampling included — compiles into ONE ``lax.scan``
program: a single dispatch per epoch, no host in the loop.  Through a
~20 ms-RTT tunnel this is the difference between ~6.6 s/epoch and device
-compute-bound epochs.

Usage::

    epoch_fn = make_scanned_sampled_trainer(loss_fn, tx, table, [25, 10])
    seed_batches = sampler.seed_batches(epoch)          # [nb, B] int32
    params, opt_state, key, losses = epoch_fn(
        params, opt_state, key, seed_batches, feats, labels)

``loss_fn(params, blocks, seeds, *data)`` receives the REVERSE-ordered
bipartite blocks exactly as the per-batch ``NeighborSampler`` yields
them, so the same model code runs in both modes.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from ..data.sampler import CSRTable, sample_fanout

__all__ = ["make_scanned_sampled_trainer", "make_dp_scanned_sampled_trainer"]


def make_scanned_sampled_trainer(
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    table: CSRTable,
    fanouts: Sequence[int],
):
    """Build a jitted one-dispatch-per-epoch trainer.

    ``loss_fn(params, blocks, seeds, *data) -> scalar`` closes over the
    model; ``*data`` (e.g. the feature matrix and labels) are passed as
    explicit epoch arguments so they live as program parameters, not
    baked-in constants.  The returned function maps
    ``(params, opt_state, key, seed_batches, *data)`` to
    ``(params, opt_state, key, losses)`` where ``seed_batches`` is
    ``[num_batches, batch]`` int32 and ``losses`` is ``[num_batches]``.

    Key discipline matches the per-batch path: one ``jax.random.split``
    per minibatch feeding :func:`sample_fanout`, so a scanned epoch with
    the same starting key reproduces the per-batch epoch bit-for-bit.
    """
    fanouts = list(fanouts)

    # the table rides as a traced ARGUMENT, not a closure capture: captured
    # device arrays are baked into the HLO as constants, which bloats the
    # serialized program by the table's full size (hundreds of MB at
    # ogbn-arxiv scale — measured as an HTTP 413 on the remote-compile
    # tunnel) and forces a recompile per table
    @jax.jit
    def _epoch(table, params, opt_state, key, seed_batches, *data):
        def body(carry, seeds):
            params, opt_state, key = carry
            key, sub = jax.random.split(key)
            blocks = sample_fanout(sub, table, seeds, fanouts)
            l, grads = jax.value_and_grad(loss_fn)(
                params, blocks, seeds, *data)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), l

        (params, opt_state, key), losses = jax.lax.scan(
            body, (params, opt_state, key), seed_batches)
        return params, opt_state, key, losses

    def epoch(params, opt_state, key, seed_batches, *data):
        return _epoch(table, params, opt_state, key, seed_batches, *data)

    return epoch


def make_dp_scanned_sampled_trainer(
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    table: CSRTable,
    fanouts: Sequence[int],
    mesh: "jax.sharding.Mesh",
    axis_name: str = "data",
):
    """Data-parallel twin of :func:`make_scanned_sampled_trainer` — the
    reference's DDP sampled-SAGE flow
    (``examples/multi_gpu/distributed_sampling.py:61-114``: per-rank
    ``train_idx`` shard, NCCL all-reduce per step) as ONE compiled
    program per epoch over a device mesh.

    Each device scans the epoch over its own seed shard, samples with a
    device-distinct key (``fold_in(axis_index)``), and gradients are
    ``psum``-averaged every step, so parameters stay replicated —
    equivalent to a global batch of ``ndev x batch`` seeds.  The epoch's
    collectives ride ICI inside the scan; the host dispatches once.

    ``seed_batches`` must be ``[num_batches, ndev * batch_local]`` —
    :meth:`NeighborSampler.seed_batches` output with a batch size divisible
    by the mesh axis; the feature/label operands are replicated.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    fanouts = list(fanouts)
    ndev = mesh.shape[axis_name]

    @jax.jit
    def _epoch(table, params, opt_state, key, seed_batches, *data):
        def shard_body(table, params, opt_state, key, seeds_shard, *data):
            # seeds_shard arrives [nb, 1, batch_local] on this device
            seeds_shard = seeds_shard[:, 0, :]
            # device-distinct sampling stream (the per-rank sampler of the
            # reference's DDP flow)
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))

            def body(carry, seeds):
                params, opt_state, key = carry
                key, sub = jax.random.split(key)
                blocks = sample_fanout(sub, table, seeds, fanouts)
                l, grads = jax.value_and_grad(loss_fn)(
                    params, blocks, seeds, *data)
                grads = jax.lax.pmean(grads, axis_name)
                l = jax.lax.pmean(l, axis_name)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, key), l

            (params, opt_state, _), losses = jax.lax.scan(
                body, (params, opt_state, key), seeds_shard)
            return params, opt_state, losses

        nb, gb = seed_batches.shape
        seeds = seed_batches.reshape(nb, ndev, gb // ndev)
        rep = P()
        params, opt_state, losses = shard_map(
            shard_body, mesh=mesh,
            in_specs=(rep, rep, rep, rep, P(None, axis_name, None))
            + (rep,) * len(data),
            out_specs=(rep, rep, rep),
            check_rep=False,
        )(table, params, opt_state, key, seeds, *data)
        # advance the epoch key deterministically on the replicated stream
        return params, opt_state, jax.random.fold_in(key, nb), losses

    def epoch(params, opt_state, key, seed_batches, *data):
        return _epoch(table, params, opt_state, key, seed_batches, *data)

    return epoch
