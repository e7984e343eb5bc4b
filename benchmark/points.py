#!/usr/bin/env python
"""Point-cloud classification benchmark — reference
``benchmark/points/`` (ModelNet10 protocol of ``train_eval.py:12-39``:
Adam + step-decayed lr, per-epoch test accuracy and wall-clock duration).

Models mirror the reference files:
* ``point_net`` (``points/point_net.py``) — 3 PointNetConv stages, each
  a radius graph at growing radius with fps downsampling (0.5 / 0.25),
  then global max pool + MLP head.
* ``edge_cnn`` (``points/edge_cnn.py``) — two DynamicEdgeConv stages
  (feature-space kNN rebuilt per forward) + MLP head.

Data: real ModelNet10 meshes if ``data/ModelNet10`` raws exist
(NormalizeScale + SamplePoints(1024), like ``points/datasets.py``), else
a 10-class parametric shape suite at the same protocol shape
(1024 points/cloud).

Usage: python benchmark/points.py [--cpu] [--model point_net|edge_cnn]
       [--epochs 20] [--batch 8] [--train-per-class 32]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _shape(rng, cls, p):
    """One of 10 parametric shape families, p points."""
    u = rng.uniform(0, 2 * np.pi, p)
    v = rng.uniform(-1, 1, p)
    if cls == 0:  # sphere
        w = rng.normal(size=(p, 3))
        pts = w / np.linalg.norm(w, axis=1, keepdims=True)
    elif cls == 1:  # ellipsoid
        w = rng.normal(size=(p, 3))
        pts = w / np.linalg.norm(w, axis=1, keepdims=True) * [1.0, 0.5, 0.3]
    elif cls == 2:  # cube surface
        pts = rng.uniform(-1, 1, size=(p, 3))
        ax = rng.integers(0, 3, p)
        pts[np.arange(p), ax] = np.sign(pts[np.arange(p), ax])
    elif cls == 3:  # cylinder
        pts = np.stack([np.cos(u), np.sin(u), v], axis=1)
    elif cls == 4:  # cone
        h = rng.uniform(0, 1, p)
        pts = np.stack([(1 - h) * np.cos(u), (1 - h) * np.sin(u),
                        2 * h - 1], axis=1)
    elif cls == 5:  # torus
        w = rng.uniform(0, 2 * np.pi, p)
        pts = np.stack([(1 + 0.35 * np.cos(w)) * np.cos(u),
                        (1 + 0.35 * np.cos(w)) * np.sin(u),
                        0.35 * np.sin(w)], axis=1)
    elif cls == 6:  # square pyramid
        h = rng.uniform(0, 1, p)
        side = rng.uniform(-1, 1, size=(p, 2)) * (1 - h)[:, None]
        pts = np.concatenate([side, (2 * h - 1)[:, None]], axis=1)
    elif cls == 7:  # flat plate with rim
        pts = np.concatenate(
            [rng.uniform(-1, 1, size=(p, 2)), 0.05 * v[:, None]], axis=1)
    elif cls == 8:  # helix tube
        t = rng.uniform(0, 4 * np.pi, p)
        pts = np.stack([np.cos(t), np.sin(t), t / (2 * np.pi) - 1],
                       axis=1) + 0.05 * rng.normal(size=(p, 3))
    else:  # two blobs (dumbbell)
        side = rng.integers(0, 2, p) * 2 - 1
        pts = 0.4 * rng.normal(size=(p, 3)) + np.stack(
            [side, np.zeros(p), np.zeros(p)], axis=1)
    pts = pts + 0.02 * rng.normal(size=(p, 3))
    pts = pts - pts.mean(axis=0, keepdims=True)
    return (pts / np.abs(pts).max()).astype(np.float32)  # NormalizeScale


def synthetic_modelnet10(per_class, points, seed=0):
    rng = np.random.default_rng(seed)
    clouds = np.stack([_shape(rng, c, points)
                       for c in range(10) for _ in range(per_class)])
    y = np.repeat(np.arange(10), per_class)
    perm = rng.permutation(len(y))
    return clouds[perm], y[perm].astype(np.int32)


def real_modelnet10(points, seed=0):
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.datasets \
        import ModelNet

    rng = np.random.default_rng(seed)
    # fail fast when raws are absent — under blocked egress the download
    # attempt would otherwise hang out its socket timeout
    if not os.path.isdir("data/ModelNet10/raw") or not any(
            os.scandir("data/ModelNet10/raw")):
        raise FileNotFoundError("data/ModelNet10/raw is empty")
    out = []
    for train in (True, False):
        ds = ModelNet("data/ModelNet10", "10", train=train)
        clouds, ys = [], []
        for g in ds._graphs:
            pos = np.asarray(g.nodes, np.float32)
            idx = rng.integers(0, pos.shape[0], points)
            p = pos[idx]
            p -= p.mean(axis=0, keepdims=True)
            clouds.append(p / np.abs(p).max())
            ys.append(int(g.y[0]))
        out.append((np.stack(clouds), np.asarray(ys, np.int32)))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--model", default="point_net",
                    choices=["point_net", "edge_cnn"])
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--train-per-class", type=int, default=32)
    ap.add_argument("--test-per-class", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--lr-decay-factor", type=float, default=0.5)
    ap.add_argument("--lr-decay-step-size", type=int, default=50)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import flax.linen as nn
    import jax.numpy as jnp
    import optax

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import (
        DynamicEdgeConv,
        PointNetConv,
    )
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.pool \
        import fps, radius_graph
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.segment \
        import segment_max

    try:
        (tr_clouds, tr_y), (te_clouds, te_y) = real_modelnet10(args.points)
        src = "ModelNet10"
    except Exception:
        tr_clouds, tr_y = synthetic_modelnet10(
            args.train_per_class, args.points, seed=0)
        te_clouds, te_y = synthetic_modelnet10(
            args.test_per_class, args.points, seed=1)
        src = "synthetic-10-class (protocol-shaped, no egress)"

    B, P = args.batch, args.points
    import math

    batch1 = np.repeat(np.arange(B), P)
    p1 = math.ceil(0.5 * P)
    batch2 = np.repeat(np.arange(B), p1)
    p2 = math.ceil(0.25 * p1)
    batch3 = np.repeat(np.arange(B), p2)

    class MLP(nn.Module):
        widths: tuple

        @nn.compact
        def __call__(self, h):
            for w in self.widths[:-1]:
                h = nn.relu(nn.Dense(w)(h))
            return nn.Dense(self.widths[-1])(h)

    class PointNet(nn.Module):
        """points/point_net.py:21-63 — 3 radius-graph PointConv stages."""

        @nn.compact
        def __call__(self, pos, *, train=False):
            # equal-size clouds -> fps keeps ceil(ratio*P) per graph and
            # groups output by graph, so every stage's batch vector is a
            # static closure (fps/radius_graph need concrete batch ids)
            batch = jnp.asarray(batch1)
            s, r, ok = radius_graph(pos, 0.2, batch,
                                    max_num_neighbors=32)
            x = nn.relu(PointNetConv(local_nn=MLP((64, 64)))(
                None, pos, s, r, num_nodes=pos.shape[0], edge_mask=ok))

            idx = fps(pos, ratio=0.5, batch=batch1)
            pos, x, batch = pos[idx], x[idx], jnp.asarray(batch2)
            s, r, ok = radius_graph(pos, 0.4, batch,
                                    max_num_neighbors=32)
            x = nn.relu(PointNetConv(local_nn=MLP((128, 128)))(
                x, pos, s, r, num_nodes=pos.shape[0], edge_mask=ok))

            idx = fps(pos, ratio=0.25, batch=batch2)
            pos, x, batch = pos[idx], x[idx], jnp.asarray(batch3)
            s, r, ok = radius_graph(pos, 1.0, batch,
                                    max_num_neighbors=32)
            x = nn.relu(PointNetConv(local_nn=MLP((256, 256)))(
                x, pos, s, r, num_nodes=pos.shape[0], edge_mask=ok))

            hg = segment_max(x, batch, num_segments=B)
            hg = nn.relu(nn.Dense(256)(hg))
            hg = nn.relu(nn.Dense(256)(hg))
            hg = nn.Dropout(0.5, deterministic=not train)(hg)
            return jax.nn.log_softmax(nn.Dense(10)(hg))

    class EdgeCNN(nn.Module):
        """points/edge_cnn.py — DynamicEdgeConv x2 + head."""

        @nn.compact
        def __call__(self, pos, *, train=False):
            batch = jnp.asarray(batch1)
            x = DynamicEdgeConv(MLP((64, 64)), k=20)(pos, batch=batch)
            x = DynamicEdgeConv(MLP((128,)), k=20)(x, batch=batch)
            hg = segment_max(x, batch, num_segments=B)
            hg = nn.relu(nn.Dense(256)(hg))
            hg = nn.Dropout(0.5, deterministic=not train)(hg)
            return jax.nn.log_softmax(nn.Dense(10)(hg))

    model = PointNet() if args.model == "point_net" else EdgeCNN()
    batch_ids = jnp.asarray(batch1)

    sched = optax.exponential_decay(
        args.lr, transition_steps=args.lr_decay_step_size
        * (len(tr_y) // B), decay_rate=args.lr_decay_factor,
        staircase=True)
    tx = optax.adam(sched)

    pos0 = jnp.asarray(tr_clouds[:B].reshape(B * P, 3))
    params = model.init(jax.random.PRNGKey(0), pos0)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, pos, yb, key):
        def loss(p):
            out = model.apply(p, pos, train=True,
                              rngs={"dropout": key})
            return -jnp.mean(jnp.take_along_axis(out, yb[:, None], 1))

        l, grads = jax.value_and_grad(loss)(params)
        u, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), opt, l

    @jax.jit
    def n_correct(params, pos, yb):
        out = model.apply(params, pos)
        return jnp.sum(jnp.argmax(out, -1) == yb)

    dev = jax.devices()[0].platform
    print(f"device={dev} model={args.model} data={src} "
          f"train={len(tr_y)} test={len(te_y)} P={P} B={B}")

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    n_test = len(te_y) - len(te_y) % B
    for epoch in range(1, args.epochs + 1):
        t0 = time.perf_counter()
        idx = rng.permutation(len(tr_y))
        for i in range(0, len(tr_y) - B + 1, B):
            sel = idx[i:i + B]
            pos = jnp.asarray(tr_clouds[sel].reshape(B * P, 3))
            key, sub = jax.random.split(key)
            params, opt, _ = step(params, opt, pos,
                                  jnp.asarray(tr_y[sel]), sub)
        correct = 0
        for i in range(0, n_test, B):
            pos = jnp.asarray(te_clouds[i:i + B].reshape(B * P, 3))
            correct += int(n_correct(params, pos,
                                     jnp.asarray(te_y[i:i + B])))
        jax.block_until_ready(params)
        print(f"Epoch: {epoch:03d}, Test: {correct / n_test:.4f}, "
              f"Duration: {time.perf_counter() - t0:.2f}")


if __name__ == "__main__":
    main()
