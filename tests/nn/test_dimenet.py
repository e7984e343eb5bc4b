"""DimeNet tests: recurrence bases vs scipy, E(3)-invariance of the output,
triplet-table correctness, and a gradient step (reference
``nn/models/dimenet.py`` behavior)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.models.dimenet import (
    DimeNet,
    _bessel_roots,
    _legendre_cos,
    _spherical_jl,
    dimenet_graph,
)


def test_spherical_bessel_recurrence_vs_scipy():
    from scipy.special import spherical_jn

    x = np.linspace(0.05, 20.0, 200)
    got = np.asarray(_spherical_jl(5, jnp.asarray(x)))
    for l in range(5):
        np.testing.assert_allclose(
            got[l], spherical_jn(l, x), rtol=2e-4, atol=1e-6
        )


def test_bessel_roots_are_roots():
    from scipy.special import spherical_jn

    roots = _bessel_roots(4, 5)
    for l in range(4):
        np.testing.assert_allclose(
            spherical_jn(l, roots[l]), 0.0, atol=1e-8
        )
        assert np.all(np.diff(roots[l]) > 0)


def test_legendre_matches_scipy():
    from scipy.special import eval_legendre

    theta = np.linspace(0, np.pi, 50)
    got = np.asarray(_legendre_cos(4, jnp.asarray(theta)))
    for l in range(4):
        norm = np.sqrt((2 * l + 1) / (4 * np.pi))
        np.testing.assert_allclose(
            got[l], norm * eval_legendre(l, np.cos(theta)), rtol=1e-5, atol=1e-6
        )


def test_triplet_table_matches_bruteforce(rng):
    pos = rng.uniform(0, 2.0, size=(8, 3)).astype(np.float32)
    g = dimenet_graph(pos, cutoff=1.5, max_edges=64, max_triplets=512)
    e = int(g.edge_mask.sum())
    t = int(g.triplet_mask.sum())
    # brute force: (k->j, j->i) pairs with k != i
    edges = [(g.senders[a], g.receivers[a]) for a in range(e)]
    expect = set()
    for eid, (j, i) in enumerate(edges):
        for e2, (k, j2) in enumerate(edges):
            if j2 == j and k != i:
                expect.add((e2, eid))
    got = {
        (int(g.idx_kj[a]), int(g.idx_ji[a])) for a in range(t)
    }
    assert got == expect


@pytest.fixture
def molecule(rng):
    n = 10
    z = rng.integers(1, 9, size=n).astype(np.int32)
    pos = rng.uniform(0, 2.5, size=(n, 3)).astype(np.float64)
    return z, pos


def test_dimenet_e3_invariance(molecule, rng):
    z, pos = molecule
    model = DimeNet(hidden_channels=16, out_channels=2, num_blocks=2,
                    num_bilinear=4, num_spherical=3, num_radial=4, cutoff=2.0)

    def run(p):
        g = dimenet_graph(p.astype(np.float32), 2.0, 128, 1024)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(z), jnp.asarray(p, jnp.float32), g
        )
        return variables, g

    variables, g0 = run(pos)
    out0 = model.apply(variables, jnp.asarray(z), jnp.asarray(pos, jnp.float32), g0)

    # random rotation + translation
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    pos2 = pos @ q.T + np.array([1.0, -2.0, 0.5])
    g2 = dimenet_graph(pos2.astype(np.float32), 2.0, 128, 1024)
    out2 = model.apply(variables, jnp.asarray(z), jnp.asarray(pos2, jnp.float32), g2)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out2), rtol=1e-3, atol=1e-4)
    assert out0.shape == (2,)


def test_dimenet_gradient_step(molecule):
    z, pos = molecule
    pos = pos.astype(np.float32)
    model = DimeNet(hidden_channels=8, out_channels=1, num_blocks=1,
                    num_bilinear=2, num_spherical=2, num_radial=3, cutoff=2.0)
    g = dimenet_graph(pos, 2.0, 128, 1024)
    variables = model.init(jax.random.PRNGKey(1), jnp.asarray(z), jnp.asarray(pos), g)

    @jax.jit
    def loss_fn(v):
        out = model.apply(v, jnp.asarray(z), jnp.asarray(pos), g)
        return jnp.sum((out - 1.0) ** 2)

    l0 = float(loss_fn(variables))
    grads = jax.grad(loss_fn)(variables)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b))), grads, 0.0
    )
    assert np.isfinite(l0) and gnorm > 0
