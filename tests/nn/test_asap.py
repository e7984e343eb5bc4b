"""ASAPooling dense-parity test (reference ``test/nn/pool/test_asap.py``
shape contract + a full NumPy replica of the reference math from
``torch_geometric/nn/pool/asap.py``)."""
import jax
import jax.numpy as jnp
import numpy as np

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu import data as D
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.pool.asap import (
    ASAPooling,
)


def _leaky(x, slope=0.2):
    return np.where(x >= 0, x, slope * x)


def _numpy_asap(x, edge_index, prm, ratio):
    """Dense replica of the reference forward (no dropout, unit edge weight,
    add_self_loops=False). Returns (x_out, perm, pooled dense adjacency)."""
    n, c = x.shape
    src, dst = edge_index
    # step 1: query = lin(max over in-neighborhood ∪ self)
    x_q = x.copy()
    for s, r in zip(src, dst):
        x_q[r] = np.maximum(x_q[r], x[s])
    x_q = x_q @ prm["lin"] + prm["lin_bias"]
    # step 2: membership attention, softmax per receiving cluster
    S = np.zeros((n, n))  # S[j, c] = score of member j in cluster c
    for cluster in range(n):
        members = [s for s, r in zip(src, dst) if r == cluster] + [cluster]
        raw = np.array(
            [
                _leaky(
                    np.concatenate([x_q[cluster], x[j]]) @ prm["att"][:, 0]
                    + prm["att_bias"][0]
                )
                for j in members
            ]
        )
        e = np.exp(raw - raw.max())
        for j, v in zip(members, e / e.sum()):
            S[j, cluster] += v
    # step 3: cluster features
    x_new = S.T @ x
    # step 4: fitness via inline LEConv with analytic self loop
    a1 = x_new @ prm["score_lin1"][:, 0]
    a2 = x_new @ prm["score_lin2"][:, 0]
    a3 = x_new @ prm["score_lin3"][:, 0]
    fit = a1 + (a2 - a3) + prm["score_bias"][0]  # self loop, weight 1
    for s, r in zip(src, dst):
        fit[r] += a2[r] - a3[s]
    fitness = 1.0 / (1.0 + np.exp(-fit))
    # top-k
    k = int(np.ceil(ratio * n))
    perm = np.argsort(-fitness, kind="stable")[:k]
    x_out = x_new[perm] * fitness[perm][:, None]
    # step 5: A' = SᵀAS restricted to survivors (A[r, s] = 1 per edge s→r)
    A = np.zeros((n, n))
    A[dst, src] = 1.0
    A_new = (S.T @ A.T @ S)[np.ix_(perm, perm)]
    np.fill_diagonal(A_new, 0.0)  # add_self_loops=False
    return x_out, perm, fitness, A_new


def test_asap_matches_numpy_replica(rng):
    n, c = 6, 16
    ei = np.array(
        [
            [0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 0, 1, 3],
            [1, 0, 2, 1, 3, 2, 4, 3, 5, 4, 0, 5, 3, 1],
        ]
    )
    x = rng.normal(size=(n, c)).astype(np.float32)
    g = D.from_edge_index(x, ei)
    p = D.pad_graph(D.batch_graphs([g]), num_nodes=8, num_edges=20, num_graphs=2)
    p = jax.tree_util.tree_map(jnp.asarray, p)

    pool = ASAPooling(c, ratio=0.5)
    variables = pool.init(jax.random.PRNGKey(3), p)
    prm = {k: np.asarray(v) for k, v in variables["params"].items()}
    out = pool.apply(variables, p)

    x_ref, perm_ref, fit_ref, A_ref = _numpy_asap(x, ei, prm, 0.5)
    k = len(perm_ref)

    assert int(out.graph.n_node[0]) == k
    np.testing.assert_array_equal(np.asarray(out.perm[:k]), perm_ref)
    np.testing.assert_allclose(
        np.asarray(out.graph.nodes[:k]), x_ref, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.fitness[:k]), fit_ref[perm_ref], rtol=1e-5
    )
    # rebuild the pooled adjacency from the static edge list
    ne = int(out.graph.n_edge[0])
    A_got = np.zeros((k, k))
    s = np.asarray(out.graph.senders[:ne])
    r = np.asarray(out.graph.receivers[:ne])
    w = np.asarray(out.graph.edges[:ne, 0])
    A_got[r, s] = w
    # reference edge convention: A'[c, d] weight of pooled edge c→d, stored
    # receiver-major in our Graph; compare the full matrix
    np.testing.assert_allclose(A_got, A_ref.T, rtol=1e-4, atol=1e-5)


def test_asap_shape_contract(rng):
    """Reference shape contract: K4 at ratio 0.5 → 2 nodes, 2 edges."""
    ei = np.array(
        [[0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3], [1, 2, 3, 0, 2, 3, 0, 1, 3, 0, 1, 2]]
    )
    x = rng.normal(size=(4, 16)).astype(np.float32)
    g = D.from_edge_index(x, ei)
    p = D.pad_graph(D.batch_graphs([g]), num_nodes=8, num_edges=16, num_graphs=2)
    p = jax.tree_util.tree_map(jnp.asarray, p)
    pool = ASAPooling(16, ratio=0.5)
    out = pool.apply(pool.init(jax.random.PRNGKey(0), p), p)
    assert int(out.graph.n_node[0]) == 2
    assert int(out.graph.n_edge[0]) == 2
    assert bool(jnp.all(jnp.isfinite(out.graph.nodes)))
