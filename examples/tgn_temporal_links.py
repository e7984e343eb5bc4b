#!/usr/bin/env python
"""TGN temporal link prediction — reference ``examples/tgn.py`` (JODIE
Wikipedia there; a synthetic recurring-interaction stream here).  The memory
state is an explicit pytree threaded through jitted steps."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.models import TGNMemory

N, RAW_D, MEM_D, TIME_D = 100, 8, 32, 16
BATCH = 32


def synthetic_stream(num_events=2048, seed=0):
    """Users interact repeatedly with a small personal set of items —
    temporal memory is predictive of the next destination."""
    rng = np.random.default_rng(seed)
    favorites = rng.integers(N // 2, N, size=(N // 2, 3))
    src = rng.integers(0, N // 2, num_events)
    dst = favorites[src, rng.integers(0, 3, num_events)]
    t = np.sort(rng.integers(0, 100_000, num_events))
    msg = rng.normal(size=(num_events, RAW_D)).astype(np.float32)
    return src.astype(np.int32), dst.astype(np.int32), t.astype(np.int32), msg


class LinkPredictor(nn.Module):
    @nn.compact
    def __call__(self, z_src, z_dst):
        h = jnp.concatenate([z_src, z_dst], axis=-1)
        h = nn.relu(nn.Dense(MEM_D)(h))
        return nn.Dense(1)(h)[..., 0]


def main():
    src, dst, t, msg = synthetic_stream()
    memory = TGNMemory(num_nodes=N, raw_msg_dim=RAW_D, memory_dim=MEM_D,
                       time_dim=TIME_D)
    predictor = LinkPredictor()
    state0 = memory.init_state(max_events=2 * BATCH)
    mem_vars = memory.init(jax.random.key(0), state0, jnp.arange(N))
    z0, _ = memory.apply(mem_vars, state0, jnp.arange(N))
    pred_vars = predictor.init(jax.random.key(1), z0[:1], z0[:1])
    params = {"mem": mem_vars, "pred": pred_vars}
    tx = optax.adam(3e-3); opt = tx.init(params)

    @jax.jit
    def step(params, opt, state, batch, key):
        bs, bd, bt, bm = batch

        def loss_fn(p):
            z, _ = memory.apply(p["mem"], state, jnp.arange(N))
            neg_dst = jax.random.randint(key, bd.shape, 0, N)
            pos = predictor.apply(p["pred"], z[bs], z[bd])
            neg = predictor.apply(p["pred"], z[bs], z[neg_dst])
            return (
                optax.sigmoid_binary_cross_entropy(pos, jnp.ones_like(pos)).mean()
                + optax.sigmoid_binary_cross_entropy(neg, jnp.zeros_like(neg)).mean()
            )

        l, g = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(g, opt)
        params = optax.apply_updates(params, u)
        new_state = memory.apply(
            params["mem"], state, bs, bd, bt, bm, method=TGNMemory.update_state
        )
        # memory is trained through the loss; commit without growing the graph
        new_state = jax.tree_util.tree_map(jax.lax.stop_gradient, new_state)
        return params, opt, new_state, l

    t0 = time.time()
    state = state0
    nb = len(src) // BATCH
    for epoch in range(10):
        state = state0
        tot = 0.0
        for i in range(nb):
            sl = slice(i * BATCH, (i + 1) * BATCH)
            batch = (jnp.asarray(src[sl]), jnp.asarray(dst[sl]),
                     jnp.asarray(t[sl]), jnp.asarray(msg[sl]))
            params, opt, state, l = step(params, opt, state, batch,
                                         jax.random.key(epoch * nb + i))
            tot += float(l)
        print(f"epoch {epoch}: mean loss={tot / nb:.4f}")

    # eval: average precision proxy on the last 10 batches
    hits = 0; total = 0
    z, _ = memory.apply(params["mem"], state, jnp.arange(N))
    rng = np.random.default_rng(9)
    for i in range(nb - 10, nb):
        sl = slice(i * BATCH, (i + 1) * BATCH)
        pos = predictor.apply(params["pred"], z[jnp.asarray(src[sl])],
                              z[jnp.asarray(dst[sl])])
        neg_dst = rng.integers(0, N, BATCH)
        neg = predictor.apply(params["pred"], z[jnp.asarray(src[sl])],
                              z[jnp.asarray(neg_dst)])
        hits += int((np.asarray(pos) > np.asarray(neg)).sum())
        total += BATCH
    print(f"pairwise ranking accuracy: {hits / total:.3f} ({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
