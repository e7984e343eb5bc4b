"""RENet — reference ``nn/models/re_net.py`` (temporal KG reasoning)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.models import (
    RENet,
    collate_events,
)

N, R, L, B, H = 12, 3, 4, 8, 48


def _stream(steps=30, per=5, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for t in range(steps):
        for _ in range(per):
            s = int(rng.integers(0, N)); r = int(rng.integers(0, R))
            out.append({"sub": s, "rel": r, "obj": (s + r + 1) % N, "t": t})
    return out


def test_pre_transform_histories():
    pt = RENet.pre_transform(L)
    evs = [pt(e) for e in _stream()]
    # first event has empty history
    assert len(evs[0]["h_sub"]) == 0
    # later events accumulate only same-relation partners, timesteps < L
    late = evs[-1]
    assert all(0 <= t < L for t in late["h_sub_t"])


def test_forward_shapes_and_learning():
    pt = RENet.pre_transform(L)
    evs = [pt(e) for e in _stream()]
    model = RENet(num_nodes=N, num_rels=R, hidden_channels=8, seq_len=L)
    batch = collate_events(evs[:B], L, H)
    params = model.init({"params": jax.random.key(0)}, batch)
    lo, ls = model.apply(params, batch)
    assert lo.shape == (B, N) and ls.shape == (B, N)
    np.testing.assert_allclose(np.exp(np.asarray(lo)).sum(1), 1.0, rtol=1e-5)

    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(params, state, b):
        def loss_fn(p):
            lo, ls = model.apply(p, b)
            return -(jnp.mean(jnp.take_along_axis(lo, b.obj[:, None], 1))
                     + jnp.mean(jnp.take_along_axis(ls, b.sub[:, None], 1)))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, state = opt.update(grads, state)
        return optax.apply_updates(params, upd), state, loss

    l0 = None
    for _ in range(40):
        params, state, loss = step(params, state, batch)
        if l0 is None:
            l0 = float(loss)
    assert float(loss) < l0 / 2


def test_mrr_metric():
    logits = np.asarray([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    m = RENet.test(logits, np.asarray([1, 0]))
    assert m[0] == 1.0 and m[1] == 1.0  # both rank-1
    m2 = RENet.test(logits, np.asarray([0, 1]))
    assert m2[0] == 0.5 and m2[1] == 0.0  # both rank-2
