"""Message-passing core — TPU-native equivalent of the reference's
``MessagePassing`` (``torch_geometric/nn/conv/message_passing.py:24-389``).

The reference base class reflects on user-defined ``message``/``aggregate``/
``update`` signatures at runtime (``Inspector``), lifts ``*_i/*_j`` arguments
by gather, and scatters via torch-scatter.  None of that reflection survives
tracing, so the TPU design is explicit and functional:

* :func:`propagate` — the free-function core: gather source/destination
  features, apply a message function, and run a masked segment reduction.
* :class:`MessagePassing` — a thin flax.linen base so convs keep the familiar
  subclass-and-override-``message`` shape of the reference API (including
  ``flow`` direction and bipartite ``(x_src, x_dst)`` inputs,
  reference ``message_passing.py:70-110``).

Layers may also override ``message_and_aggregate`` to use a fused SpMM path,
mirroring the reference's ``SparseTensor`` fast path
(``message_passing.py:219-229``).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from ..data.graph import Graph
from ..ops.segment import aggregate, sharded_aggregate
from .. import _axis_context as _pctx

PairArray = Tuple[Optional[jnp.ndarray], Optional[jnp.ndarray]]


def _aggregate(aggr, msg, receivers, num_nodes, *, mask, indices_are_sorted):
    """Local aggregate, or local-reduce + cross-shard collective when an
    ``parallel.context.edge_sharding`` scope is active (edge-partitioned
    graph parallelism — the propagate layer is the single place where edge
    space collapses to node space, hence the single place a collective is
    needed)."""
    axis = _pctx.edge_axis()
    if axis is None:
        return aggregate(
            aggr, msg, receivers, num_nodes,
            mask=mask, indices_are_sorted=indices_are_sorted,
        )
    return sharded_aggregate(
        aggr, msg, receivers, num_nodes, axis,
        mask=mask, indices_are_sorted=indices_are_sorted,
    )


def propagate(
    x: Union[jnp.ndarray, PairArray],
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    num_nodes: int,
    *,
    message_fn: Optional[Callable[..., jnp.ndarray]] = None,
    edge_weight: Optional[jnp.ndarray] = None,
    edge_attr: Optional[jnp.ndarray] = None,
    edge_mask: Optional[jnp.ndarray] = None,
    aggr: str = "add",
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Gather → message → masked segment-aggregate.

    ``x`` may be a single ``[N, F]`` array or a ``(x_src, x_dst)`` pair for
    bipartite graphs (sampled blocks).  ``message_fn(x_j, x_i, edge_attr,
    edge_weight)`` defaults to ``w_e · x_j``.
    """
    x_src, x_dst = x if isinstance(x, tuple) else (x, x)
    x_j = x_src[senders]
    if message_fn is None:
        msg = x_j if edge_weight is None else x_j * edge_weight[:, None]
    else:
        x_i = None if x_dst is None else x_dst[receivers]
        msg = message_fn(x_j, x_i, edge_attr, edge_weight)
    return _aggregate(
        aggr, msg, receivers, num_nodes,
        mask=edge_mask, indices_are_sorted=indices_are_sorted,
    )


def resolve_graph_args(x, graph_or_senders, receivers=None, num_nodes=None, edge_mask=None):
    """Common argument unpacking for conv layers: accept either a
    :class:`Graph` or raw ``(senders, receivers)`` COO arrays.

    Returns ``(x_pair, senders, receivers, num_nodes, edge_mask, edge_attr)``.
    """
    edge_attr = None
    if isinstance(graph_or_senders, Graph):
        g = graph_or_senders
        senders, receivers = g.senders, g.receivers
        num_nodes = g.num_nodes if num_nodes is None else num_nodes
        edge_mask = g.edge_mask() if edge_mask is None else edge_mask
        edge_attr = g.edges
    else:
        senders = graph_or_senders
    x_pair = x if isinstance(x, tuple) else (x, x)
    if num_nodes is None:
        num_nodes = x_pair[1].shape[0]
    return x_pair, senders, receivers, num_nodes, edge_mask, edge_attr


class MessagePassing(nn.Module):
    """Base class for conv layers.  Subclasses override :meth:`message` (and
    optionally :meth:`update` / :meth:`message_and_aggregate`) and declare
    their own ``aggr``/``flow`` dataclass fields if configurable.

    Class-level defaults (not dataclass fields, so subclasses may freely add
    required fields): ``aggr='add'``, ``flow='source_to_target'``.
    """

    # NOTE: intentionally ClassVar-style defaults, not dataclass fields.
    _default_aggr = "add"
    _default_flow = "source_to_target"

    @property
    def aggr_(self) -> str:
        return getattr(self, "aggr", self._default_aggr)

    @property
    def flow_(self) -> str:
        return getattr(self, "flow", self._default_flow)

    # -- overridables ------------------------------------------------------
    def message(self, x_j, x_i=None, edge_attr=None, edge_weight=None):
        """Per-edge message; default ``w_e · x_j`` (reference
        ``message_passing.py:186-217`` default message)."""
        return x_j if edge_weight is None else x_j * edge_weight[:, None]

    def update_fn(self, aggr_out, x=None):
        return aggr_out

    def message_and_aggregate(self, x, senders, receivers, num_nodes, **kw):
        """Fused path hook; return None to use the unfused gather/scatter."""
        return None

    # -- driver -------------------------------------------------------------
    def propagate(
        self,
        x: Union[jnp.ndarray, PairArray],
        senders: jnp.ndarray,
        receivers: jnp.ndarray,
        num_nodes: int,
        *,
        edge_weight: Optional[jnp.ndarray] = None,
        edge_attr: Optional[jnp.ndarray] = None,
        edge_mask: Optional[jnp.ndarray] = None,
        indices_are_sorted: bool = False,
    ) -> jnp.ndarray:
        if self.flow_ == "target_to_source":
            senders, receivers = receivers, senders
        fused = self.message_and_aggregate(
            x, senders, receivers, num_nodes,
            edge_weight=edge_weight, edge_attr=edge_attr, edge_mask=edge_mask,
        )
        if fused is not None:
            return self.update_fn(fused, x=x)
        x_src, x_dst = x if isinstance(x, tuple) else (x, x)
        x_j = x_src[senders]
        x_i = None if x_dst is None else x_dst[receivers]
        msg = self.message(x_j, x_i=x_i, edge_attr=edge_attr, edge_weight=edge_weight)
        out = _aggregate(
            self.aggr_, msg, receivers, num_nodes,
            mask=edge_mask, indices_are_sorted=indices_are_sorted,
        )
        return self.update_fn(out, x=x)

    # convenience: accept a Graph directly
    def propagate_graph(self, g: Graph, x=None, **kw) -> jnp.ndarray:
        x = g.nodes if x is None else x
        return self.propagate(
            x, g.senders, g.receivers, g.num_nodes,
            edge_mask=g.edge_mask(), edge_attr=g.edges, **kw,
        )
