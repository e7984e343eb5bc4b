"""Static-shape graph container — the TPU-native replacement for PyG's ``Data``.

The reference framework (``torch_geometric/data/data.py:43-427``) stores ragged
per-graph tensors and concatenates them dynamically at batch time
(``data/batch.py:36-156``).  Under XLA every distinct shape triggers a
recompile, so this framework instead represents a (batch of) graph(s) as a
single :class:`Graph` NamedTuple with *static* padded shapes plus validity
masks.  All aggregation/pooling code is written against this contract:

* ``nodes``     — ``[N_pad, ...]`` pytree of node features.
* ``edges``     — ``[E_pad, ...]`` pytree of edge features (or ``None``).
* ``senders``   — ``[E_pad]`` int32, source node index of each edge.
* ``receivers`` — ``[E_pad]`` int32, destination node index of each edge.
* ``globals``   — ``[G_pad, ...]`` pytree of per-graph features (or ``None``).
* ``n_node``    — ``[G_pad]`` int32, number of valid nodes per graph.
* ``n_edge``    — ``[G_pad]`` int32, number of valid edges per graph.
* ``y``         — optional labels (per-graph ``[G_pad, ...]`` or per-node).

Layout convention (mirrors the reference's ``Batch.from_data_list``
disconnected-union with index offsetting):

* Valid nodes/edges are contiguous: graph 0's nodes first, then graph 1's, …
* Padding nodes/edges sit at the tail and are **not counted** in
  ``n_node`` / ``n_edge``.
* Padding *graphs* are trailing entries with ``n_node == 0`` (a real graph
  always has ≥ 1 node in this framework).  ``node_graph_ids`` assigns all
  padding nodes to the last graph slot, so batching code must always pad the
  graph axis by at least one slot whenever node padding was added — the
  bucketed collater in ``batch.py`` guarantees this.
* Padded edges have ``senders = receivers = N_pad - 1`` (a padding node), so
  scatter-adds of zeroed messages are harmless and never touch valid rows.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import _axis_context as _pctx

ArrayLike = Any  # jnp.ndarray | np.ndarray pytree leaf


class Graph(NamedTuple):
    """A batch of graphs as one statically-shaped disconnected union."""

    nodes: Any
    senders: ArrayLike
    receivers: ArrayLike
    n_node: ArrayLike
    n_edge: ArrayLike
    edges: Any = None
    globals: Any = None
    y: Any = None

    # ---- derived static properties -------------------------------------
    @property
    def num_nodes(self) -> int:
        """Static padded node count N_pad."""
        return jax.tree_util.tree_leaves(self.nodes)[0].shape[0]

    @property
    def num_edges(self) -> int:
        """Static padded edge count E_pad."""
        return self.senders.shape[0]

    @property
    def num_graphs(self) -> int:
        """Static padded graph count G_pad."""
        return self.n_node.shape[0]

    # ---- masks & segment ids -------------------------------------------
    def node_graph_ids(self) -> jnp.ndarray:
        """``[N_pad]`` graph index of every node (the reference's ``batch``
        vector, ``data/batch.py:36-156``).  Padding nodes map to the last
        graph slot (a padding graph, by the layout convention)."""
        return _segment_ids(self.n_node, self.num_nodes)

    def edge_graph_ids(self) -> jnp.ndarray:
        """``[E_pad]`` graph index of every edge.  Under an active
        ``parallel.context.edge_sharding`` scope, ``self`` holds only the
        local shard of the edge set and ids are computed at global offsets."""
        return _segment_ids(
            self.n_edge, self.num_edges,
            offset=_pctx.edge_shard_offset(self.num_edges),
        )

    def node_mask(self) -> jnp.ndarray:
        """``[N_pad]`` bool — True for valid (non-padding) nodes."""
        return jnp.arange(self.num_nodes) < jnp.sum(self.n_node)

    def edge_mask(self) -> jnp.ndarray:
        """``[E_pad]`` bool — True for valid (non-padding) edges (offset by
        this device's shard position under ``edge_sharding``)."""
        off = _pctx.edge_shard_offset(self.num_edges)
        return (jnp.arange(self.num_edges) + off) < jnp.sum(self.n_edge)

    def graph_mask(self) -> jnp.ndarray:
        """``[G_pad]`` bool — True for real graphs (``n_node > 0``)."""
        return self.n_node > 0

    def replace(self, **kwargs) -> "Graph":
        return self._replace(**kwargs)


def _segment_ids(counts: jnp.ndarray, total: int, offset=0) -> jnp.ndarray:
    """Expand per-graph counts into an id vector of static length ``total``.

    Entries beyond ``sum(counts)`` (padding) get the last graph index.
    Implemented as a vectorized searchsorted so it stays O(total · G) matmul-
    free VPU work under jit (G is tiny — the batch size).  ``offset`` shifts
    the local index range for sharded arrays.
    """
    num_graphs = counts.shape[0]
    offsets = jnp.cumsum(counts)
    pos = jnp.arange(total) + offset
    ids = jnp.sum(pos[:, None] >= offsets[None, :], axis=1)
    return jnp.minimum(ids, num_graphs - 1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Construction helpers (host-side, NumPy — used by the data pipeline)
# ---------------------------------------------------------------------------

def from_edge_index(
    x: np.ndarray,
    edge_index: np.ndarray,
    *,
    edge_attr: Optional[np.ndarray] = None,
    y: Optional[np.ndarray] = None,
    globals: Optional[np.ndarray] = None,
    num_nodes: Optional[int] = None,
) -> Graph:
    """Build a single-graph :class:`Graph` from a PyG-style ``edge_index``.

    Mirrors ``Data(x=..., edge_index=..., y=...)`` of the reference
    (``torch_geometric/data/data.py:43``) but stores senders/receivers
    separately (COO rows/cols).
    """
    x = np.asarray(x)
    edge_index = np.asarray(edge_index, dtype=np.int32)
    if edge_index.ndim != 2 or edge_index.shape[0] != 2:
        raise ValueError(f"edge_index must be [2, E], got {edge_index.shape}")
    n = int(num_nodes) if num_nodes is not None else int(x.shape[0])
    e = int(edge_index.shape[1])
    if y is not None:
        y = np.asarray(y)
    return Graph(
        nodes=x,
        senders=edge_index[0],
        receivers=edge_index[1],
        edges=None if edge_attr is None else np.asarray(edge_attr),
        globals=None if globals is None else np.asarray(globals),
        y=y,
        n_node=np.asarray([n], dtype=np.int32),
        n_edge=np.asarray([e], dtype=np.int32),
    )


def edge_index_of(g: Graph) -> jnp.ndarray:
    """``[2, E]`` COO view (senders row 0, receivers row 1)."""
    xp = jnp if isinstance(g.senders, jnp.ndarray) else np
    return xp.stack([g.senders, g.receivers], axis=0)
