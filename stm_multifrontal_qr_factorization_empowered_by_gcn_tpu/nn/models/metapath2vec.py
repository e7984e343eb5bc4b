"""MetaPath2Vec — reference ``torch_geometric/nn/models/metapath2vec.py``
(Dong et al., KDD'17): heterogeneous random walks following a metapath,
skip-gram with negative sampling over one offset-packed embedding table.

TPU-native: the reference samples walks on CPU via ``SparseTensor.sample``
inside a DataLoader collate (``metapath2vec.py:115-152``); here each relation
gets a padded :class:`~.node2vec.NeighborTable` and the whole heterogeneous
walk runs on device — the per-step relation is static (metapath cycling), so
the walk is an unrolled sequence of uniform table lookups, jittable end to
end.  Window extraction and the skip-gram loss mirror the reference exactly
(``loss`` at ``metapath2vec.py:159-184``).
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .node2vec import NeighborTable, build_neighbor_table

EdgeType = Tuple[str, str, str]
EPS = 1e-15


def build_metapath_tables(
    edge_index_dict: Dict[EdgeType, np.ndarray],
    num_nodes_dict: Dict[str, int],
    metapath: Sequence[EdgeType],
    width: int = 32,
) -> List[NeighborTable]:
    """One padded neighbor table per metapath step (repeated relations share
    the underlying arrays)."""
    cache: Dict[EdgeType, NeighborTable] = {}
    tables = []
    for rel in metapath:
        if rel not in cache:
            ei = np.asarray(edge_index_dict[rel])
            cache[rel] = build_neighbor_table(
                ei[0], ei[1], num_nodes_dict[rel[0]], width=width
            )
        tables.append(cache[rel])
    return tables


class MetaPath2Vec(nn.Module):
    """Offset-packed heterogeneous skip-gram (reference behavior; walks on
    device)."""

    num_nodes_dict: Dict[str, int]
    metapath: Tuple[EdgeType, ...]
    embedding_dim: int
    walk_length: int
    context_size: int
    walks_per_node: int = 1
    num_negative_samples: int = 1

    def setup(self):
        if self.metapath[0][0] != self.metapath[-1][-1]:
            raise ValueError("metapath must be cyclic (start type == end type)")
        if self.walk_length < self.context_size:
            raise ValueError("walk_length must be >= context_size")
        types = sorted(
            {k[0] for k in self.metapath} | {k[-1] for k in self.metapath}
        )
        start, count = {}, 0
        for t in types:
            start[t] = count
            count += self.num_nodes_dict[t]
        self._start = start
        self._count = count
        # per-walk-position offset into the packed table (reference :89-95)
        offs = [start[self.metapath[0][0]]]
        offs += [start[k[-1]] for k in self.metapath] * (
            self.walk_length // len(self.metapath) + 1
        )
        self._offset = jnp.asarray(offs[: self.walk_length + 1], jnp.int32)
        self.embedding = nn.Embed(count, self.embedding_dim)

    def __call__(self, node_type: str, batch=None) -> jnp.ndarray:
        s = self._start[node_type]
        idx = jnp.arange(self.num_nodes_dict[node_type]) if batch is None else batch
        return self.embedding(s + idx)

    # -- walks (device side) -------------------------------------------------
    def pos_walks(
        self, key: jax.Array, tables: List[NeighborTable], starts: jnp.ndarray
    ) -> jnp.ndarray:
        """[W * windows, context_size] positive skip-gram windows."""
        cur = jnp.repeat(starts, self.walks_per_node)
        rws = [cur]
        keys = jax.random.split(key, self.walk_length)
        for i in range(self.walk_length):
            t = tables[i % len(self.metapath)]
            idx = jax.random.randint(keys[i], cur.shape, 0, 1 << 30)
            cur = t.neighbors[cur, idx % t.degrees[cur]]
            rws.append(cur)
        rw = jnp.stack(rws, axis=-1) + self._offset[None, :]
        return self._windows(rw)

    def neg_walks(self, key: jax.Array, starts: jnp.ndarray) -> jnp.ndarray:
        cur = jnp.repeat(starts, self.walks_per_node * self.num_negative_samples)
        rws = [cur]
        keys = jax.random.split(key, self.walk_length)
        for i in range(self.walk_length):
            t_dst = self.metapath[i % len(self.metapath)][-1]
            cur = jax.random.randint(
                keys[i], cur.shape, 0, self.num_nodes_dict[t_dst]
            )
            rws.append(cur)
        rw = jnp.stack(rws, axis=-1) + self._offset[None, :]
        return self._windows(rw)

    def _windows(self, rw: jnp.ndarray) -> jnp.ndarray:
        num = rw.shape[1] - self.context_size + 1
        return jnp.concatenate(
            [rw[:, j : j + self.context_size] for j in range(num)], axis=0
        )

    def loss(self, pos_rw: jnp.ndarray, neg_rw: jnp.ndarray) -> jnp.ndarray:
        """Skip-gram NLL, identical math to ``metapath2vec.py:159-184``."""

        def term(rw, sign):
            h_start = self.embedding(rw[:, 0])[:, None, :]
            h_rest = self.embedding(rw[:, 1:])
            out = jnp.sum(h_start * h_rest, axis=-1).reshape(-1)
            p = jax.nn.sigmoid(out)
            return -jnp.mean(jnp.log((p if sign > 0 else 1 - p) + EPS))

        return term(pos_rw, +1) + term(neg_rw, -1)
