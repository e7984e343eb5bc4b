"""Full-batch SAGE on a Reddit-shaped power-law graph with an SpMM plan.

Twin of the reference's ``examples/reddit.py`` deployment regime
(hub-skewed social graph), using the TPU-native execution plan instead of
per-call gather/scatter:

* ``ops.plan.build_mean_plan`` analyzes the structure once — degree-sort
  relabel, dense hub blocks on the MXU, flat-kernel gather tail — and the
  backward runs its own transpose-skew decomposition (``spmm_planned``);
* node-indexed inputs (features, labels, mask) are relabeled ONCE into
  the plan's frame (``plan.perm``) and every epoch runs permute-free —
  the frame-resident recipe measured at 5.5× the segment-op epoch in
  ``benchmark/fullbatch_plan_check.py``.

Runs on CPU in ~a minute at the default demo scale; pass ``--nodes`` /
``--edges`` for the real shape on a TPU.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=3000)
    ap.add_argument("--edges", type=int, default=30000)
    ap.add_argument("--feat", type=int, default=64)
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import flax.linen as nn
    import jax.numpy as jnp
    import optax

    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import SAGEConv
    from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.ops.plan import (
        build_mean_plan,
    )

    rng = np.random.default_rng(0)
    n, e = args.nodes, args.edges
    pop = rng.zipf(1.5, n).astype(np.float64)
    p = pop / pop.sum()
    send = rng.choice(n, size=e, p=p).astype(np.int32)
    recv = rng.choice(n, size=e, p=p).astype(np.int32)
    x = rng.normal(size=(n, args.feat)).astype(np.float32)
    y = rng.integers(0, args.classes, size=n).astype(np.int32)
    train_mask = (np.arange(n) % 2 == 0).astype(np.float32)

    plan = build_mean_plan(send, recv, n)
    print(f"plan: method={plan.method} "
          f"relabel={'degree' if plan.perm is not None else 'none'}")

    # enter the plan's frame once; afterwards the plan never permutes
    if plan.perm is not None:
        perm = np.asarray(plan.perm)
        x, y, train_mask = x[perm], y[perm], train_mask[perm]
        plan = plan._replace(perm=None, inv_perm=None)

    dims = (64, args.classes)

    class FullSAGE(nn.Module):
        @nn.compact
        def __call__(self, h):
            for i, d in enumerate(dims):
                h = SAGEConv((h.shape[-1], h.shape[-1]), d,
                             name=f"conv{i}")(h, None, None, plan=plan)
                if i < len(dims) - 1:
                    h = nn.relu(h)
            return jax.nn.log_softmax(h)

    model = FullSAGE()
    xj, yj, tm = jnp.asarray(x), jnp.asarray(y), jnp.asarray(train_mask)
    params = model.init(jax.random.key(0), xj)
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, h):
        def loss(p):
            logp = model.apply(p, h)
            nll = -jnp.take_along_axis(logp, yj[:, None], 1)[:, 0]
            return jnp.sum(nll * tm) / jnp.sum(tm)

        l, g = jax.value_and_grad(loss)(params)
        u, opt = tx.update(g, opt)
        return optax.apply_updates(params, u), opt, l

    for epoch in range(args.epochs):
        params, opt, l = step(params, opt, xj)
        if epoch % 10 == 0 or epoch == args.epochs - 1:
            logp = model.apply(params, xj)
            acc = float(jnp.sum((jnp.argmax(logp, 1) == yj) * tm) / jnp.sum(tm))
            print(f"epoch {epoch:3d}: loss={float(l):.4f} train acc={acc:.3f}")


if __name__ == "__main__":
    main()
