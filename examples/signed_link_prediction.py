#!/usr/bin/env python
"""SignedGCN link-sign prediction — reference ``examples/signed_gcn.py``
(Bitcoin-OTC there; a synthetic balanced-communities signed graph here,
no egress in this environment)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.models import (
    SignedGCN,
    create_spectral_features,
    signed_gcn_test,
    split_edges,
)


def synthetic_signed_graph(n=200, e=2000, seed=0):
    """Trust-score model (like real signed networks: sign is driven by node
    reputations): each node has a latent trust t_i; an edge is positive with
    probability σ(4(t_s + t_r − 1)).  Note a two-camp parity graph would be
    the WRONG synthetic here — edge sign would be an XOR of camp labels,
    which SignedGCN's linear pair discriminator provably cannot express."""
    rng = np.random.default_rng(seed)
    trust = rng.random(n)
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    keep = s != r
    s, r = s[keep], r[keep]
    p_pos = 1.0 / (1.0 + np.exp(-4 * (trust[s] + trust[r] - 1)))
    sign = rng.random(len(s)) < p_pos
    return np.stack([s[sign], r[sign]]), np.stack([s[~sign], r[~sign]])


def main():
    pos_ei, neg_ei = synthetic_signed_graph()
    n = int(max(pos_ei.max(), neg_ei.max())) + 1
    train_pos, test_pos = split_edges(pos_ei, 0.2, seed=1)
    train_neg, test_neg = split_edges(neg_ei, 0.2, seed=1)

    model = SignedGCN(in_channels=32, hidden_channels=64, num_layers=2)
    x = jnp.asarray(create_spectral_features(train_pos, train_neg, n, 32))
    pe = (jnp.asarray(train_pos[0]), jnp.asarray(train_pos[1]))
    ne = (jnp.asarray(train_neg[0]), jnp.asarray(train_neg[1]))
    variables = model.init(jax.random.key(0), x, pe, ne, method=SignedGCN.init_all)
    # lr 1e-2 collapses z via the triplet terms (Adam-normalized
    # steps kill the ReLUs); 1e-3 trains stably
    tx = optax.adam(1e-3); opt = tx.init(variables)

    @jax.jit
    def step(v, o, key):
        def loss_fn(v):
            z = model.apply(v, x, pe, ne)
            return model.apply(v, key, z, pe, ne, method=SignedGCN.loss)
        l, g = jax.value_and_grad(loss_fn)(v)
        u, o = tx.update(g, o)
        return optax.apply_updates(v, u), o, l

    t0 = time.time()
    for epoch in range(800):
        variables, opt, l = step(variables, opt, jax.random.key(epoch))
        if epoch % 200 == 0:
            print(f"epoch {epoch}: loss={float(l):.4f}")
    z = model.apply(variables, x, pe, ne)
    auc, f1 = signed_gcn_test(model, variables, z, test_pos, test_neg)
    print(f"held-out link-sign AUC={auc:.4f} F1={f1:.4f} ({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
