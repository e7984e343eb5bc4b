"""Junction-tree decomposition of molecular graphs — reference
``torch_geometric/utils/tree_decomposition.py`` (JT-VAE, Jin et al. 2018).

The reference requires an ``rdkit.Chem.Mol``; here the same algorithm runs
on a plain bond graph (senders/receivers), with ring perception via
networkx's minimum cycle basis (rdkit's ``GetSymmSSSR`` role) — no chemistry
dependency.  Returns (tree_edge_index, atom2clique_index, num_cliques) and
optionally a per-clique vocab id (0 ring / 1 bond / 2 bridged / 3 singleton),
matching the reference's ``return_vocab``.  Merge and singleton rules follow
``tree_decomposition.py:49-101`` exactly.
"""
from __future__ import annotations

from itertools import chain

import numpy as np


def tree_decomposition(senders, receivers, num_nodes: int,
                       return_vocab: bool = False):
    """Junction-tree decomposition of a molecular graph (rings + bonds -> cliques, min spanning tree over clique overlaps) — reference ``utils/tree_decomposition.py``."""
    import networkx as nx
    import scipy.sparse as sp
    from scipy.sparse.csgraph import minimum_spanning_tree

    s = np.asarray(senders)
    r = np.asarray(receivers)
    G = nx.Graph()
    G.add_nodes_from(range(num_nodes))
    G.add_edges_from((int(a), int(b)) for a, b in zip(s, r) if a != b)

    # cliques = rings (GetSymmSSSR role) + non-ring bonds (reference :30-41)
    rings = [sorted(c) for c in nx.minimum_cycle_basis(G)]
    ring_edges = set()
    for c in rings:
        cs = set(c)
        for a in c:
            for b in G.neighbors(a):
                if b in cs:
                    ring_edges.add((min(a, b), max(a, b)))
    bonds = [
        [a, b] for a, b in ((min(u, v), max(u, v)) for u, v in G.edges)
        if (a, b) not in ring_edges
    ]
    cliques = [list(c) for c in rings] + bonds
    xs = [0] * len(rings) + [1] * len(bonds)

    def build_a2c():
        a2c = [[] for _ in range(num_nodes)]
        for c, atoms in enumerate(cliques):
            for a in atoms:
                a2c[a].append(c)
        return a2c

    atom2clique = build_a2c()

    # merge rings sharing > 2 atoms (bridged compounds, reference :49-61)
    for c1 in range(len(cliques)):
        for atom in list(cliques[c1]):
            for c2 in list(atom2clique[atom]):
                if c1 >= c2 or len(cliques[c1]) <= 2 or len(cliques[c2]) <= 2:
                    continue
                if len(set(cliques[c1]) & set(cliques[c2])) > 2:
                    cliques[c1] = sorted(set(cliques[c1]) | set(cliques[c2]))
                    xs[c1] = 2
                    cliques[c2] = []
                    xs[c2] = -1
    keep = [k for k in range(len(cliques)) if cliques[k]]
    cliques = [cliques[k] for k in keep]
    xs = [x for x in xs if x >= 0]
    atom2clique = build_a2c()

    # singleton cliques + initial clique-graph edges (reference :69-101)
    edges = {}
    for atom in range(num_nodes):
        cs = atom2clique[atom]
        if len(cs) <= 1:
            continue
        bond_cs = [c for c in cs if len(cliques[c]) == 2]
        ring_cs = [c for c in cs if len(cliques[c]) > 4]
        if len(bond_cs) > 2 or (len(bond_cs) == 2 and len(cs) > 2):
            cliques.append([atom])
            xs.append(3)
            c2 = len(cliques) - 1
            for c1 in cs:
                edges[(c1, c2)] = 1
        elif len(ring_cs) > 2:
            cliques.append([atom])
            xs.append(3)
            c2 = len(cliques) - 1
            for c1 in cs:
                edges[(c1, c2)] = 99
        else:
            for i in range(len(cs)):
                for j in range(i + 1, len(cs)):
                    c1, c2 = cs[i], cs[j]
                    count = len(set(cliques[c1]) & set(cliques[c2]))
                    edges[(c1, c2)] = min(count, edges.get((c1, c2), 99))
    atom2clique = build_a2c()

    nc = len(cliques)
    if edges:
        pairs = np.asarray(list(edges.keys()))
        inv_w = 100 - np.asarray(list(edges.values()))
        W = sp.coo_matrix((inv_w, (pairs[:, 0], pairs[:, 1])), shape=(nc, nc))
        T = minimum_spanning_tree(W.tocsr()).tocoo()
        tree_edge_index = np.stack(
            [np.concatenate([T.row, T.col]), np.concatenate([T.col, T.row])]
        ).astype(np.int64)
        order = np.lexsort((tree_edge_index[1], tree_edge_index[0]))
        tree_edge_index = tree_edge_index[:, order]
    else:
        tree_edge_index = np.empty((2, 0), np.int64)

    a2c_rows = list(
        chain.from_iterable([a] * len(cs) for a, cs in enumerate(atom2clique))
    )
    a2c_cols = list(chain.from_iterable(atom2clique))
    atom2clique_index = np.asarray([a2c_rows, a2c_cols], np.int64).reshape(2, -1)

    if return_vocab:
        return tree_edge_index, atom2clique_index, nc, np.asarray(xs, np.int64)
    return tree_edge_index, atom2clique_index, nc
