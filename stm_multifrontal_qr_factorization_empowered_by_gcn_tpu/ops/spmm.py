"""Sparse matrix–dense matrix products (message+aggregate fused paths).

Three interchangeable implementations of the hot op
``out[i] = reduce_{e: recv(e)=i} w_e · x[send(e)]``:

* :func:`spmm_coo` — gather + masked segment reduction.  The general path;
  XLA lowers it to gather + (sorted) scatter.  Analog of the reference's
  unfused ``__lift__`` + ``aggregate`` (``nn/conv/message_passing.py:124-300``).
* :func:`spmm_dense` — dense masked adjacency matmul (MXU).  Exact reference
  oracle for tests and the fastest choice for small, dense-ish graphs
  (the 408-matrix classifier batches qualify); analog of the reference's
  fused ``message_and_aggregate``/``torch_sparse.matmul`` path
  (``nn/conv/gcn_conv.py:192-195``).
* ``ops.pallas.spmm`` — Pallas row-blocked kernel for large graphs (imported
  lazily; see that module for the roofline story).

All paths take *static* shapes and an optional edge validity mask.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .. import _axis_context as _pctx
from .segment import aggregate, sharded_aggregate


def spmm_coo(
    x: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    num_nodes: int,
    *,
    edge_weight: Optional[jnp.ndarray] = None,
    edge_mask: Optional[jnp.ndarray] = None,
    aggr: str = "add",
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """COO gather–scatter SpMM. ``x``: [N, F] → out [num_nodes, F].

    Under an active ``parallel.context.edge_sharding`` scope the segment
    reduction finishes with the cross-shard collective (edge-partitioned
    graph parallelism)."""
    msg = x[senders]
    if edge_weight is not None:
        msg = msg * edge_weight[:, None]
    axis = _pctx.edge_axis()
    if axis is not None:
        return sharded_aggregate(
            aggr, msg, receivers, num_nodes, axis,
            mask=edge_mask, indices_are_sorted=indices_are_sorted,
        )
    return aggregate(
        aggr,
        msg,
        receivers,
        num_nodes,
        mask=edge_mask,
        indices_are_sorted=indices_are_sorted,
    )


def adjacency_dense(
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    num_nodes: int,
    *,
    edge_weight: Optional[jnp.ndarray] = None,
    edge_mask: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Materialize the dense ``[num_nodes, num_nodes]`` adjacency, A[r, s] = w."""
    w = jnp.ones(senders.shape[0], dtype) if edge_weight is None else edge_weight.astype(dtype)
    if edge_mask is not None:
        w = jnp.where(edge_mask, w, 0)
    adj = jnp.zeros((num_nodes, num_nodes), dtype)
    return adj.at[receivers, senders].add(w)


def spmm_dense(
    x: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    num_nodes: int,
    *,
    edge_weight: Optional[jnp.ndarray] = None,
    edge_mask: Optional[jnp.ndarray] = None,
    aggr: str = "add",
) -> jnp.ndarray:
    """Dense-adjacency SpMM on the MXU (sum/mean only; max falls back)."""
    if aggr in ("add", "sum"):
        adj = adjacency_dense(
            senders, receivers, num_nodes, edge_weight=edge_weight, edge_mask=edge_mask,
            dtype=x.dtype,
        )
        return jnp.dot(adj, x, preferred_element_type=jnp.float32).astype(x.dtype)
    if aggr == "mean":
        adj = adjacency_dense(
            senders, receivers, num_nodes, edge_weight=edge_weight, edge_mask=edge_mask,
            dtype=x.dtype,
        )
        deg = jnp.maximum(adj.sum(axis=1, keepdims=True), 1)
        return (jnp.dot(adj, x, preferred_element_type=jnp.float32) / deg).astype(x.dtype)
    return spmm_coo(
        x, senders, receivers, num_nodes,
        edge_weight=edge_weight, edge_mask=edge_mask, aggr=aggr,
    )


def best_spmm(num_nodes: int, num_edges: int, num_feats: int):
    """Pick the fastest SpMM implementation for the given static problem size.

    Dispatch policy (benchmarked on TPU v5e):

    * a Pallas CSR row-blocked kernel when available and the graph is large
      enough to amortize kernel launch (see ``ops.pallas.spmm``),
    * dense-adjacency MXU matmul when N is small (adjacency fits VMEM-ish),
    * COO gather/segment-sum otherwise.

    Returns ``run(x, senders, receivers, num_nodes, *, edge_weight=None,
    edge_mask=None)``; receivers must be sorted ascending (the collater's CSR
    layout guarantees this) so XLA takes its sorted-scatter path.
    """
    if num_nodes <= 2048:
        return spmm_dense

    try:
        from .pallas.spmm import spmm_pallas_available, spmm_csr_pallas

        if spmm_pallas_available():
            return spmm_csr_pallas
    except ImportError:
        pass

    def run(x, senders, receivers, n, *, edge_weight=None, edge_mask=None):
        return spmm_coo(
            x, senders, receivers, n,
            edge_weight=edge_weight, edge_mask=edge_mask,
            indices_are_sorted=True,
        )

    return run
