#!/usr/bin/env python
"""RENet on a temporal knowledge-graph event stream — reference
``examples/renet.py`` (train on (s, r, o, t) quadruples with per-entity
event histories, report filtered-free Hits@1/3/10 on held-out events;
ICEWS18 raws if present, else a synthetic periodic event stream)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.models import (
    RENet,
    collate_events,
)

N_ENT, N_REL, SEQ, HIST, B = 40, 5, 4, 256, 32


def synth_events(num=1200, seed=0):
    """Periodic relational process: relation r tends to connect entity
    clusters (s mod 5 -> (s + r) mod clusters), so histories predict."""
    rng = np.random.default_rng(seed)
    events = []
    for t in range(num // 8):
        for _ in range(8):
            s = int(rng.integers(0, N_ENT))
            r = int(rng.integers(0, N_REL))
            base = (s + 7 * r) % N_ENT
            o = int((base + rng.integers(0, 3)) % N_ENT)
            events.append({"sub": s, "rel": r, "obj": o, "t": t})
    return events


def main():
    events = synth_events()
    pre = RENet.pre_transform(SEQ)
    events = [pre(e) for e in events]
    split = int(0.9 * len(events))
    train, test = events[:split], events[split:]

    model = RENet(num_nodes=N_ENT, num_rels=N_REL, hidden_channels=32,
                  seq_len=SEQ, dropout=0.2)
    batch0 = collate_events(train[:B], SEQ, HIST)
    params = model.init(jax.random.key(0), batch0)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, batch, key):
        def loss(p):
            lp_obj, lp_sub = model.apply(p, batch, train=True,
                                         rngs={"dropout": key})
            nll_o = -jnp.take_along_axis(lp_obj, batch.obj[:, None], 1)
            nll_s = -jnp.take_along_axis(lp_sub, batch.sub[:, None], 1)
            return jnp.mean(nll_o) + jnp.mean(nll_s)
        l, grads = jax.value_and_grad(loss)(params)
        u, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), opt, l

    @jax.jit
    def ranks(params, batch):
        lp_obj, _ = model.apply(params, batch)
        true = jnp.take_along_axis(lp_obj, batch.obj[:, None], 1)
        return 1 + jnp.sum(lp_obj > true, axis=1)

    key = jax.random.key(1)
    rng = np.random.default_rng(2)
    for epoch in range(1, 11):
        order = rng.permutation(len(train))
        tot, nb = 0.0, 0
        for i in range(0, len(train) - B + 1, B):
            batch = collate_events([train[j] for j in order[i:i + B]],
                                   SEQ, HIST)
            key, sub = jax.random.split(key)
            params, opt, l = step(params, opt, batch, sub)
            tot += float(l); nb += 1
        if epoch % 5 == 0:
            rs = []
            for i in range(0, len(test) - B + 1, B):
                rs.append(np.asarray(ranks(
                    params, collate_events(test[i:i + B], SEQ, HIST))))
            rs = np.concatenate(rs)
            print(f"epoch {epoch:3d}  loss {tot / nb:.4f}  "
                  f"MRR {np.mean(1.0 / rs):.4f}  "
                  f"Hits@1 {np.mean(rs <= 1):.3f}  "
                  f"Hits@3 {np.mean(rs <= 3):.3f}  "
                  f"Hits@10 {np.mean(rs <= 10):.3f}")


if __name__ == "__main__":
    main()
