"""Edge-partitioned giant graphs with all-to-all halo exchange.

The BASELINE north star's scaling axis (SURVEY.md §5 long-context row): one
graph too big for a chip is split into node partitions (one per device along
the ``graph`` mesh axis); each device owns its nodes' features and all edges
*arriving* at its nodes; the sender features that live on other devices (the
**halo**) are exchanged with a single ``all_to_all`` over ICI, then
aggregation is purely local.  This is the graph analog of sequence/context
parallelism — and the TPU-native replacement for the reference's Cluster-GCN
partitions + NCCL (``data/cluster.py``, ``distributed_sampling.py``).

Host side (:func:`partition_graph`) builds the static tables:
  * per-part padded node/edge arrays (relabeled local indices),
  * per (p → q) halo request lists, padded to one ``halo_max``, such that
    device q's send slice to p is exactly p's request list from q.

Device side (:func:`halo_exchange`, :func:`partitioned_spmm`) runs inside
``shard_map`` over the ``graph`` axis; extended feature table =
``concat([x_local, recv])`` and the precomputed local sender indices point
into it.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import Graph
from .mesh import GRAPH_AXIS


class PartitionedGraph(NamedTuple):
    """Static-shape partition tables, all leading-axis-P (sharded over the
    ``graph`` mesh axis inside shard_map)."""

    nodes: jnp.ndarray          # [P, N_max, F]
    node_mask: jnp.ndarray      # [P, N_max]
    y: Optional[jnp.ndarray]    # [P, N_max, ...] or None
    senders_ext: jnp.ndarray    # [P, E_max] int32 into the extended table
    receivers: jnp.ndarray      # [P, E_max] int32 into local nodes
    edge_mask: jnp.ndarray      # [P, E_max]
    edge_weight: Optional[jnp.ndarray]  # [P, E_max] or None
    halo_send: jnp.ndarray      # [P, P, H_max] int32: rows I send to part q
    halo_send_mask: jnp.ndarray  # [P, P, H_max]
    global_ids: jnp.ndarray     # [P, N_max] original node id of each slot
    num_parts: int
    n_max: int
    halo_max: int


def _pg_flatten(g: PartitionedGraph):
    children = (
        g.nodes, g.node_mask, g.y, g.senders_ext, g.receivers, g.edge_mask,
        g.edge_weight, g.halo_send, g.halo_send_mask, g.global_ids,
    )
    return children, (g.num_parts, g.n_max, g.halo_max)


jax.tree_util.register_pytree_node(
    PartitionedGraph,
    _pg_flatten,
    lambda aux, ch: PartitionedGraph(*ch, *aux),
)


def partition_graph(
    g: Graph,
    num_parts: int,
    *,
    partition_fn: Optional[Callable] = None,
    part: Optional[np.ndarray] = None,
) -> PartitionedGraph:
    """Host-side partitioning + halo-table construction."""
    n = int(np.sum(g.n_node))
    s = np.asarray(g.senders)[: int(np.sum(g.n_edge))]
    r = np.asarray(g.receivers)[: int(np.sum(g.n_edge))]
    w = None if g.edges is None else np.asarray(g.edges)[: len(s)]

    if part is None:
        if partition_fn is None:
            try:
                from .. import native

                # edges are receiver-owned, so the per-part edge load is the
                # sum of receiver degrees; on skew-degree graphs a node-
                # balanced cut puts almost all edges on the hub part
                # (measured: Zipf-1.5 at P=2 left 99.8 % of edges on one
                # side) — weight vertices by 1 + in-degree so the bisection
                # balances EDGES
                deg = np.bincount(r, minlength=n)
                skewed = n > 0 and deg.max(initial=0) > 8 * max(
                    len(r) / max(n, 1), 1.0)
                vw = (1 + deg).astype(np.int32) if skewed else None
                partition_fn = lambda s_, r_, n_, p_: native.ml_partition(
                    s_, r_, n_, p_, vweights=vw)
            except Exception:
                from ..data.cluster import bfs_partition

                partition_fn = bfs_partition
        part = np.asarray(partition_fn(s, r, n, num_parts))

    locals_of = [np.nonzero(part == p)[0] for p in range(num_parts)]
    local_idx = np.full(n, -1, np.int64)
    for p, nodes in enumerate(locals_of):
        local_idx[nodes] = np.arange(len(nodes))
    n_max = max(max(len(x) for x in locals_of), 1)

    # per-part edges (receiver-owned), remote sender requests
    edges_of = [np.nonzero(part[r] == p)[0] for p in range(num_parts)]
    e_max = max(max(len(e) for e in edges_of), 1)
    requests = [[None] * num_parts for _ in range(num_parts)]  # p wants from q
    for p in range(num_parts):
        es = edges_of[p]
        remote = s[es][part[s[es]] != p]
        for q in range(num_parts):
            req = np.unique(remote[part[remote] == q]) if len(remote) else np.zeros(0, np.int64)
            requests[p][q] = req
    halo_max = max(
        max((len(requests[p][q]) for p in range(num_parts) for q in range(num_parts)), default=0), 1
    )

    f_shape = np.asarray(g.nodes).shape[1:]
    nodes = np.zeros((num_parts, n_max) + f_shape, np.asarray(g.nodes).dtype)
    node_mask = np.zeros((num_parts, n_max), bool)
    global_ids = np.zeros((num_parts, n_max), np.int32)
    y = None
    y_arr = None if g.y is None else np.asarray(g.y)
    node_level_y = y_arr is not None and y_arr.shape[0] >= n
    if node_level_y:
        y = np.zeros((num_parts, n_max) + y_arr.shape[1:], y_arr.dtype)
    senders_ext = np.zeros((num_parts, e_max), np.int32)
    receivers = np.zeros((num_parts, e_max), np.int32)
    edge_mask = np.zeros((num_parts, e_max), bool)
    edge_weight = None if w is None else np.zeros((num_parts, e_max), w.dtype)
    halo_send = np.zeros((num_parts, num_parts, halo_max), np.int32)
    halo_send_mask = np.zeros((num_parts, num_parts, halo_max), bool)

    x_np = np.asarray(g.nodes)
    for p in range(num_parts):
        own = locals_of[p]
        nodes[p, : len(own)] = x_np[own]
        node_mask[p, : len(own)] = True
        global_ids[p, : len(own)] = own
        if node_level_y:
            y[p, : len(own)] = y_arr[own]
        es = edges_of[p]
        receivers[p, : len(es)] = local_idx[r[es]]
        edge_mask[p, : len(es)] = True
        if w is not None:
            edge_weight[p, : len(es)] = w[es]
        # extended sender index: local | N_max + q*H_max + pos_in_request
        sl = s[es]
        ext = np.empty(len(es), np.int64)
        own_mask = part[sl] == p
        ext[own_mask] = local_idx[sl[own_mask]]
        for q in range(num_parts):
            if q == p:
                continue
            req = requests[p][q]
            mq = part[sl] == q
            if mq.any():
                pos = np.searchsorted(req, sl[mq])
                ext[mq] = n_max + q * halo_max + pos
        senders_ext[p, : len(es)] = ext
        # what I must SEND: to each destination d, d's request list from me
        for d in range(num_parts):
            if d == p:
                continue
            req = requests[d][p]
            halo_send[p, d, : len(req)] = local_idx[req]
            halo_send_mask[p, d, : len(req)] = True

    return PartitionedGraph(
        nodes=jnp.asarray(nodes),
        node_mask=jnp.asarray(node_mask),
        y=None if y is None else jnp.asarray(y),
        senders_ext=jnp.asarray(senders_ext),
        receivers=jnp.asarray(receivers),
        edge_mask=jnp.asarray(edge_mask),
        edge_weight=None if edge_weight is None else jnp.asarray(edge_weight),
        halo_send=jnp.asarray(halo_send),
        halo_send_mask=jnp.asarray(halo_send_mask),
        global_ids=jnp.asarray(global_ids),
        num_parts=num_parts,
        n_max=n_max,
        halo_max=halo_max,
    )


# ---------------------------------------------------------------------------
# device side (inside shard_map over GRAPH_AXIS; pg leaves sharded on axis 0)
# ---------------------------------------------------------------------------

def halo_exchange(
    x_local: jnp.ndarray,
    halo_send: jnp.ndarray,
    halo_send_mask: jnp.ndarray,
    *,
    axis_name: str = GRAPH_AXIS,
) -> jnp.ndarray:
    """Exchange halo rows: returns ``[P * H_max, F]`` where slice q holds the
    rows this device requested from part q (zeros for padding)."""
    send = x_local[halo_send]                       # [P, H, F]
    send = jnp.where(halo_send_mask[..., None], send, 0)
    recv = jax.lax.all_to_all(
        send, axis_name, split_axis=0, concat_axis=0, tiled=True
    )  # [P, H, F]: slice q = rows part q sent to me = my request list from q
    return recv.reshape(-1, x_local.shape[-1])


def extended_features(x_local: jnp.ndarray, pg: PartitionedGraph, *, axis_name=GRAPH_AXIS):
    """``concat([x_local, halo rows])`` — the table ``senders_ext`` indexes."""
    halo = halo_exchange(
        x_local, pg.halo_send, pg.halo_send_mask, axis_name=axis_name
    )
    return jnp.concatenate([x_local, halo], axis=0)


def partitioned_spmm(
    x_local: jnp.ndarray,
    pg: PartitionedGraph,
    *,
    edge_weight: Optional[jnp.ndarray] = None,
    aggr: str = "add",
    axis_name: str = GRAPH_AXIS,
    overlap: bool = True,
) -> jnp.ndarray:
    """One aggregation layer over the partitioned graph: halo exchange +
    local gather/segment-reduce.  All receiver-side reductions are local, so
    no collective is needed after the exchange (contrast with the
    full-replication edge sharding in ``data_parallel``).

    With ``overlap=True`` (default) the edges are processed in two waves:
    **interior** edges (sender local, ``senders_ext < n_max``) aggregate
    straight from ``x_local`` with no data dependency on the collective, so
    XLA's async all-to-all (start/done pair under the latency-hiding
    scheduler) overlaps the ICI transfer with the interior gather+reduce —
    the double-buffering SURVEY §7.3 calls for, expressed as dataflow
    independence instead of hand-rolled buffers.  Halo-dependent edges are
    reduced second, from the received rows only.  Numerically identical to
    the sequential path (same adds, same masks; equivalence-tested).
    """
    from ..ops.segment import aggregate

    ew = pg.edge_weight if edge_weight is None else edge_weight
    n_local = x_local.shape[0]

    if not overlap:
        x_ext = extended_features(x_local, pg, axis_name=axis_name)
        msg = x_ext[pg.senders_ext]
        if ew is not None:
            msg = msg * ew[:, None]
        return aggregate(aggr, msg, pg.receivers, n_local, mask=pg.edge_mask)

    # issue the exchange first; nothing below depends on it until wave 2
    recv = halo_exchange(
        x_local, pg.halo_send, pg.halo_send_mask, axis_name=axis_name
    )  # [P*H, F]

    interior = pg.senders_ext < n_local
    m_int = pg.edge_mask & interior
    m_halo = pg.edge_mask & ~interior

    if aggr not in ("add", "sum", "max", "mean"):
        raise ValueError(f"unsupported aggr {aggr!r}")

    # wave 1: interior edges — depends only on x_local
    s_int = jnp.where(m_int, pg.senders_ext, 0)
    msg = x_local[s_int]
    if ew is not None:
        msg = msg * ew[:, None]

    # wave 2: halo edges — first consumer of the all_to_all result
    s_halo = jnp.where(m_halo, pg.senders_ext - n_local, 0)
    msg_h = recv[s_halo]
    if ew is not None:
        msg_h = msg_h * ew[:, None]

    if aggr == "max":
        # keep -inf identity in the partials; zero-fill only at the end
        # (matching segment_max's empty-segment convention)
        neg = jnp.asarray(-jnp.inf, x_local.dtype)
        out_int = jax.ops.segment_max(
            jnp.where(m_int[:, None], msg, neg), pg.receivers, n_local
        )
        out_h = jax.ops.segment_max(
            jnp.where(m_halo[:, None], msg_h, neg), pg.receivers, n_local
        )
        out = jnp.maximum(out_int, out_h)
        return jnp.where(jnp.isneginf(out), 0, out)

    out = aggregate("add", msg, pg.receivers, n_local, mask=m_int) + aggregate(
        "add", msg_h, pg.receivers, n_local, mask=m_halo
    )
    if aggr == "mean":
        ones = jnp.ones(pg.receivers.shape[0], x_local.dtype)
        cnt = aggregate("add", ones, pg.receivers, n_local, mask=pg.edge_mask)
        out = out / jnp.maximum(cnt, 1.0)[:, None]
    return out


def local_part(pg: PartitionedGraph) -> PartitionedGraph:
    """Strip the sharded leading axis inside ``shard_map`` (each device sees
    its own [1, ...] slice of every leaf)."""
    return jax.tree_util.tree_map(lambda a: a[0], pg)


def gather_global(
    values_local: jnp.ndarray,
    global_ids_local: jnp.ndarray,
    node_mask_local: jnp.ndarray,
    num_nodes: int,
    *,
    axis_name: str = GRAPH_AXIS,
) -> jnp.ndarray:
    """Per-part rows back into global node order (for eval): local scatter
    into a zero global table + ``psum`` over the parts axis (parts own
    disjoint node sets, so the sum is exact — and the result is provably
    replicated for shard_map's vma checker, unlike an all_gather)."""
    flat_i = jnp.where(node_mask_local, global_ids_local, num_nodes)
    local = (
        jnp.zeros((num_nodes, values_local.shape[-1]), values_local.dtype)
        .at[flat_i]
        .set(values_local, mode="drop")
    )
    return jax.lax.psum(local, axis_name)
