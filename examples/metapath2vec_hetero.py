#!/usr/bin/env python
"""MetaPath2Vec heterogeneous embeddings — reference
``examples/metapath2vec.py`` (AMiner): on-device metapath walks
(author→paper→author) + skip-gram with negative sampling; authors from the
same community must embed closer than cross-community pairs."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import optax

from stm_multifrontal_qr_factorization_empowered_by_gcn_tpu.nn.models.metapath2vec import (
    MetaPath2Vec, build_metapath_tables)


def synthetic_bibliography(seed=0, communities=3, authors=60, papers=90):
    """Authors write papers within their community (plus few cross links)."""
    rng = np.random.default_rng(seed)
    a_comm = np.repeat(np.arange(communities), authors // communities)
    p_comm = np.repeat(np.arange(communities), papers // communities)
    src, dst = [], []
    for a in range(len(a_comm)):
        own = np.nonzero(p_comm == a_comm[a])[0]
        other = np.nonzero(p_comm != a_comm[a])[0]
        for p in rng.choice(own, 4, replace=False):
            src.append(a); dst.append(int(p))
        if rng.random() < 0.2:
            src.append(a); dst.append(int(rng.choice(other)))
    ap = np.stack([np.asarray(src), np.asarray(dst)])
    pa = ap[::-1]
    edge_index_dict = {("a", "writes", "p"): ap, ("p", "written", "a"): pa}
    nnd = {"a": len(a_comm), "p": len(p_comm)}
    return edge_index_dict, nnd, a_comm


def main():
    eid, nnd, a_comm = synthetic_bibliography()
    metapath = (("a", "writes", "p"), ("p", "written", "a"))
    model = MetaPath2Vec(num_nodes_dict=nnd, metapath=metapath,
                         embedding_dim=32, walk_length=6, context_size=3,
                         walks_per_node=4, num_negative_samples=2)
    tables = build_metapath_tables(eid, nnd, metapath)
    starts = jnp.arange(nnd["a"])
    variables = model.init(jax.random.PRNGKey(0), "a")
    tx = optax.adam(0.025)
    opt = tx.init(variables)

    @jax.jit
    def step(v, o, key):
        k1, k2 = jax.random.split(key)

        def loss_fn(v):
            pos = model.apply(v, k1, tables, starts,
                              method=MetaPath2Vec.pos_walks)
            neg = model.apply(v, k2, starts, method=MetaPath2Vec.neg_walks)
            return model.apply(v, pos, neg, method=MetaPath2Vec.loss)

        l, g = jax.value_and_grad(loss_fn)(v)
        upd, o = tx.update(g, o)
        return optax.apply_updates(v, upd), o, l

    key = jax.random.PRNGKey(3)
    for epoch in range(1, 81):
        key, k = jax.random.split(key)
        variables, opt, loss = step(variables, opt, k)
        if epoch % 20 == 0:
            print(f"epoch {epoch:3d}  skip-gram loss {float(loss):.4f}")

    z = np.asarray(model.apply(variables, "a"))
    z = z / np.linalg.norm(z, axis=1, keepdims=True)
    sim = z @ z.T
    same = sim[a_comm[:, None] == a_comm[None, :]].mean()
    diff = sim[a_comm[:, None] != a_comm[None, :]].mean()
    print(f"mean cosine: same-community {same:.3f} vs cross {diff:.3f}")
    assert same > diff + 0.1
    print("communities separate in embedding space ✓")


if __name__ == "__main__":
    main()
