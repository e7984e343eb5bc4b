"""Batching: disconnected union + static padding + shape bucketing.

Replaces the reference's dynamic ``Batch.from_data_list``
(``torch_geometric/data/batch.py:36-156``): node/edge tensors are concatenated
with index offsetting exactly like the reference, then padded to a static
bucket shape so one XLA compilation serves every batch of a bucket.

Host-side (NumPy) by design: this runs in the input pipeline, off the TPU.
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .graph import Graph


def batch_graphs(graphs: Sequence[Graph]) -> Graph:
    """Disconnected union of single-graph ``Graph``s (no padding).

    Mirrors ``Batch.from_data_list`` semantics: node indices of graph *k* are
    offset by the cumulative node count of graphs ``0..k-1``
    (``data/batch.py:96-120`` of the reference).
    """
    if not graphs:
        raise ValueError("cannot batch zero graphs")
    offsets = np.cumsum([0] + [int(g.nodes.shape[0]) for g in graphs])[:-1]
    nodes = np.concatenate([np.asarray(g.nodes) for g in graphs], axis=0)
    senders = np.concatenate(
        [np.asarray(g.senders) + off for g, off in zip(graphs, offsets)]
    ).astype(np.int32)
    receivers = np.concatenate(
        [np.asarray(g.receivers) + off for g, off in zip(graphs, offsets)]
    ).astype(np.int32)
    n_node = np.concatenate([np.asarray(g.n_node) for g in graphs]).astype(np.int32)
    n_edge = np.concatenate([np.asarray(g.n_edge) for g in graphs]).astype(np.int32)

    def _cat_optional(field):
        vals = [getattr(g, field) for g in graphs]
        if all(v is None for v in vals):
            return None
        if any(v is None for v in vals):
            raise ValueError(f"inconsistent optional field {field!r} across graphs")
        return np.concatenate([np.asarray(v) for v in vals], axis=0)

    return Graph(
        nodes=nodes,
        senders=senders,
        receivers=receivers,
        n_node=n_node,
        n_edge=n_edge,
        edges=_cat_optional("edges"),
        globals=_cat_optional("globals"),
        y=_cat_optional("y"),
    )


def pad_graph(
    g: Graph,
    *,
    num_nodes: int,
    num_edges: int,
    num_graphs: Optional[int] = None,
) -> Graph:
    """Pad a batched ``Graph`` to static ``(num_nodes, num_edges, num_graphs)``.

    Padding edges point at node ``num_nodes - 1`` (always a padding node since
    we require ``num_nodes > sum(n_node)`` whenever padding is added — see the
    layout contract in :mod:`graph`).  Padding graphs get ``n_node == 0``.
    """
    cur_n = int(np.sum(g.n_node))
    cur_e = int(np.sum(g.n_edge))
    cur_g = int(g.n_node.shape[0])
    if num_graphs is None:
        num_graphs = cur_g + 1
    if num_nodes < cur_n or num_edges < cur_e or num_graphs < cur_g:
        raise ValueError(
            f"pad target ({num_nodes},{num_edges},{num_graphs}) smaller than "
            f"actual ({cur_n},{cur_e},{cur_g})"
        )
    if (num_nodes > cur_n or num_edges > cur_e) and num_graphs == cur_g:
        raise ValueError(
            "padding nodes/edges requires at least one padding graph slot "
            "(pass num_graphs > number of real graphs)"
        )

    pad_n = num_nodes - cur_n
    pad_e = num_edges - cur_e
    pad_g = num_graphs - cur_g

    def _pad_rows(a, count):
        if a is None:
            return None
        a = np.asarray(a)
        widths = [(0, count)] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, widths)

    nodes = _pad_rows(g.nodes, pad_n)
    edges = _pad_rows(g.edges, pad_e)
    sentinel = np.full((pad_e,), num_nodes - 1, dtype=np.int32)
    senders = np.concatenate([np.asarray(g.senders, np.int32), sentinel])
    receivers = np.concatenate([np.asarray(g.receivers, np.int32), sentinel])
    n_node = _pad_rows(g.n_node, pad_g)
    n_edge = _pad_rows(g.n_edge, pad_g)
    globals_ = _pad_rows(g.globals, pad_g)
    y = g.y
    if y is not None:
        y = np.asarray(y)
        pad_y = pad_g if y.shape[0] == cur_g else pad_n
        y = _pad_rows(y, pad_y)
    return Graph(
        nodes=nodes,
        senders=senders,
        receivers=receivers,
        n_node=n_node,
        n_edge=n_edge,
        edges=edges,
        globals=globals_,
        y=y,
    )


def _round_up(x: int, base: int) -> int:
    return int(math.ceil(max(x, 1) / base) * base)


def bucket_shape(
    n: int, e: int, *, node_multiple: int = 128, edge_multiple: int = 512
) -> Tuple[int, int]:
    """Power-of-two-ish bucketing to bound recompilation count.

    Rounds up to the next multiple, then to the next power-of-two bucket
    above 4× the multiple — so the number of distinct compiled shapes stays
    O(log(max_size)) while padding waste stays < 50 % (typically ≪ 30 % once
    batches mix sizes).
    """
    def _bucket(v: int, mult: int) -> int:
        v = _round_up(v + 1, mult)  # +1 ⇒ always ≥1 padding slot for masks
        p = mult
        while p < v:
            p *= 2
        return p

    return _bucket(n, node_multiple), _bucket(e, edge_multiple)


def pad_to_bucket(
    g: Graph,
    *,
    num_graphs: Optional[int] = None,
    node_multiple: int = 128,
    edge_multiple: int = 512,
) -> Graph:
    """Pad a batch to the next ``(num_nodes, num_edges, num_graphs)`` bucket so jit recompiles only per bucket, not per shape."""
    n, e = bucket_shape(
        int(np.sum(g.n_node)),
        int(np.sum(g.n_edge)),
        node_multiple=node_multiple,
        edge_multiple=edge_multiple,
    )
    gg = int(g.n_node.shape[0]) + 1 if num_graphs is None else num_graphs
    return pad_graph(g, num_nodes=n, num_edges=e, num_graphs=gg)


def unbatch(g: Graph) -> List[Graph]:
    """Split a (possibly padded) batch back into single ``Graph``s.

    Inverse of :func:`batch_graphs`; mirrors ``Batch.to_data_list``
    (``data/batch.py:158-241`` of the reference).  Host-side.
    """
    n_node = np.asarray(g.n_node)
    n_edge = np.asarray(g.n_edge)
    node_off = np.cumsum(np.concatenate([[0], n_node]))
    edge_off = np.cumsum(np.concatenate([[0], n_edge]))
    out = []
    nodes = np.asarray(g.nodes)
    senders = np.asarray(g.senders)
    receivers = np.asarray(g.receivers)
    for i in range(len(n_node)):
        if n_node[i] == 0:  # padding graph
            continue
        ns, ne = slice(node_off[i], node_off[i + 1]), slice(edge_off[i], edge_off[i + 1])
        y = None
        if g.y is not None:
            yarr = np.asarray(g.y)
            y = yarr[i : i + 1] if yarr.shape[0] == len(n_node) else yarr[ns]
        out.append(
            Graph(
                nodes=nodes[ns],
                senders=(senders[ne] - node_off[i]).astype(np.int32),
                receivers=(receivers[ne] - node_off[i]).astype(np.int32),
                n_node=np.asarray([n_node[i]], np.int32),
                n_edge=np.asarray([n_edge[i]], np.int32),
                edges=None if g.edges is None else np.asarray(g.edges)[ne],
                globals=None if g.globals is None else np.asarray(g.globals)[i : i + 1],
                y=y,
            )
        )
    return out
