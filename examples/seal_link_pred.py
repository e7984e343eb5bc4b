#!/usr/bin/env python
"""SEAL link prediction — reference ``examples/seal_link_pred.py``: for each
candidate edge, extract the k-hop enclosing subgraph (``utils.k_hop_subgraph``),
label nodes by Double-Radius Node Labeling (DRNL), and classify the subgraph
with a small GNN + readout (positive = real edge, negative = random pair)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu import data as D
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn import (
    GraphConv, global_add_pool)
from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.utils.subgraph import (
    k_hop_subgraph)

B = 16
N_PAD, E_PAD = None, None  # set from the extracted subgraphs in main()
MAXZ = 8  # DRNL label cap


def drnl(sub_s, sub_r, n_sub, a, b):
    """Double-radius node labels: z = 1 + min(da, db) + (d//2)*((d//2)+(d%2)-1)
    with d = da + db (Zhang & Chen 2018), capped to MAXZ."""
    def bfs_dist(src):
        dist = np.full(n_sub, 1 << 20)
        dist[src] = 0
        frontier = [src]
        while frontier:
            nxt = []
            for u in frontier:
                for v in sub_r[sub_s == u]:
                    if dist[v] > dist[u] + 1:
                        dist[v] = dist[u] + 1
                        nxt.append(v)
            frontier = nxt
        return dist

    da, db = bfs_dist(a), bfs_dist(b)
    d = da + db
    half = d // 2
    z = 1 + np.minimum(da, db) + half * (half + d % 2 - 1)
    z[(da > 1 << 19) | (db > 1 << 19)] = 0  # unreachable
    z[a] = 1; z[b] = 1
    return np.clip(z, 0, MAXZ - 1)


def enclosing_subgraph(pair, s, r, n):
    subset, ss, rr, _ = k_hop_subgraph(list(pair), 1, s, r, n, relabel_nodes=True)
    a = int(np.nonzero(subset == pair[0])[0][0])
    b = int(np.nonzero(subset == pair[1])[0][0])
    # drop the target edge itself (else the label leaks)
    keep = ~(((ss == a) & (rr == b)) | ((ss == b) & (rr == a)))
    ss, rr = ss[keep], rr[keep]
    z = drnl(ss, rr, len(subset), a, b)
    x = np.eye(MAXZ, dtype=np.float32)[z]
    return D.from_edge_index(x, np.stack([ss, rr]))


class Net(nn.Module):
    @nn.compact
    def __call__(self, g):
        h = jax.nn.relu(GraphConv(MAXZ, 32)(g.nodes, g))
        h = jax.nn.relu(GraphConv(32, 32)(h, g))
        hg = global_add_pool(h, g)
        return nn.Dense(2)(jax.nn.relu(nn.Dense(32)(hg)))


def main():
    # sparse geometric graph (6-NN of latent 2D points): real link structure,
    # so random negative pairs rarely share neighbors — the regime SEAL's
    # enclosing-subgraph labels are designed for
    rng = np.random.default_rng(0)
    n = 300
    pts = rng.uniform(size=(n, 2))
    d2 = ((pts[:, None] - pts[None, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    nbr = np.argsort(d2, axis=1)[:, :6]
    s = np.concatenate([np.repeat(np.arange(n), 6), nbr.reshape(-1)])
    r = np.concatenate([nbr.reshape(-1), np.repeat(np.arange(n), 6)])
    pairs = np.unique(np.sort(np.stack([s, r], 1), 1), axis=0)
    pos = pairs[rng.permutation(len(pairs))[:128]]
    neg = rng.integers(0, n, size=(128, 2))
    subs = [enclosing_subgraph(tuple(p), s, r, n) for p in pos] + \
           [enclosing_subgraph(tuple(p), s, r, n) for p in neg]
    ys = np.asarray([1] * len(pos) + [0] * len(neg), np.int32)
    global N_PAD, E_PAD
    N_PAD = B * max(int(g_.n_node[0]) for g_ in subs) + 1
    E_PAD = B * max(int(g_.n_edge[0]) for g_ in subs) + 1

    net = Net()

    def padded(idx):
        gs = [subs[j]._replace(y=np.asarray([ys[j]], np.int32)) for j in idx]
        p = D.pad_graph(D.batch_graphs(gs), num_nodes=N_PAD, num_edges=E_PAD,
                        num_graphs=B + 1)
        return jax.tree_util.tree_map(jnp.asarray, p)

    order = rng.permutation(len(subs))
    train_idx, test_idx = order[:192], order[192:]
    params = net.init(jax.random.PRNGKey(0), padded(train_idx[:B]))
    opt = optax.adam(2e-3)
    state = opt.init(params)
    gmask = jnp.asarray(np.arange(B + 1) < B)

    @jax.jit
    def step(params, state, g):
        def loss_fn(p):
            out = jax.nn.log_softmax(net.apply(p, g))
            y = g.y.reshape(-1).astype(jnp.int32)
            ll = -jnp.take_along_axis(out, y[:, None], 1)[:, 0]
            return jnp.sum(ll * gmask) / gmask.sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, state = opt.update(grads, state)
        return optax.apply_updates(params, upd), state, loss

    @jax.jit
    def n_correct(params, g):
        pred = jnp.argmax(net.apply(params, g), -1)
        return jnp.sum((pred == g.y.reshape(-1)) * gmask)

    for epoch in range(1, 21):
        sh = rng.permutation(train_idx)
        tot = 0.0
        for i in range(0, len(sh) - B + 1, B):
            params, state, loss = step(params, state, padded(sh[i:i + B]))
            tot += float(loss)
        if epoch % 5 == 0:
            correct, total = 0, 0
            for i in range(0, len(test_idx) - B + 1, B):
                correct += int(n_correct(params, padded(test_idx[i:i + B])))
                total += B
            print(f"epoch {epoch:3d}  loss {tot:.3f}  test acc {correct/total:.4f}")


if __name__ == "__main__":
    main()
