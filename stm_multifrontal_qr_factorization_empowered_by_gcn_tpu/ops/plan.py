"""SpMM execution plans — one-time structure analysis + format selection.

The reference dispatches its hot aggregation between a COO gather/scatter
path and a fused ``SparseTensor`` path at every call
(``torch_geometric/nn/conv/message_passing.py:219-256``).  On TPU the right
format depends on measurable structure properties, and converting is a
host-side one-time cost (like the reference's ``ToSparseTensor`` transform),
so this module separates *planning* from *execution*:

``build_spmm_plan`` inspects the graph once and returns a :class:`SpmmPlan`
combining up to two differentiable executors:

* **BSR** (``ops/bsr.py``) — 128x128 dense blocks on the MXU, for the
  locality-rich part of the edge set (matrix-structure graphs after an RCM
  relabel, ``utils/rcm.py``).  Engaged for blocks holding at least
  ``bsr_min_edges`` edges (a dense bf16 block costs ~the HBM traffic of ~64
  gathered f32 rows, so that is the break-even).
* **tight ELL** (``ops/ell.py``) — width-adaptive padded gather for the
  remainder / for structureless graphs.  Width is chosen to minimize
  gathered-row volume (the v5e gather is row-transaction-bound at ~525M
  rows/s; see ``benchmark/microbench_tpu.py``), trading a slightly longer
  virtual-row combine for far fewer padded slots than the old fixed
  ``width=64`` table.

Plans are pytrees: safe to close over or pass through ``jit`` boundaries,
with the format choice static.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .bsr import BsrMatrix, bsr_from_coo, spmm_bsr
from .ell import EllGraph, ell_from_coo, spmm_ell


class SpmmPlan(NamedTuple):
    """Differentiable SpMM executor; ``apply(x) == A @ x`` for the planned
    adjacency (weights baked in at build time)."""

    bsr_fwd: Optional[BsrMatrix]
    bsr_bwd: Optional[BsrMatrix]
    ell_fwd: Optional[EllGraph]
    ell_bwd: Optional[EllGraph]
    num_nodes: int
    method: str  # 'bsr' | 'ell' | 'hybrid'

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        out = None
        if self.bsr_fwd is not None:
            out = spmm_bsr(x, self.bsr_fwd, self.bsr_bwd)[: self.num_nodes]
        if self.ell_fwd is not None:
            e = spmm_ell(x, self.ell_fwd, self.ell_bwd)[: self.num_nodes]
            out = e if out is None else out + e
        if out is None:
            out = jnp.zeros_like(x)
        return out

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.apply(x)


def _plan_flatten(p: SpmmPlan):
    return (p.bsr_fwd, p.bsr_bwd, p.ell_fwd, p.ell_bwd), (p.num_nodes, p.method)


def _plan_unflatten(aux, children):
    return SpmmPlan(*children, num_nodes=aux[0], method=aux[1])


jax.tree_util.register_pytree_node(SpmmPlan, _plan_flatten, _plan_unflatten)


def pick_ell_width(
    receivers: np.ndarray, num_nodes: int, candidates=(4, 8, 16, 32, 64)
) -> int:
    """Width minimizing estimated HBM cost: gathered slots (the v5e gather
    engine is row-bound at ~370-460M rows/s, benchmark/ell_decompose.py)
    plus ~2 row-equivalents of virtual-row combine + accumulate overhead
    per virtual row (calibrated on the N=131k/E=4.2M bench shape, where
    this model correctly ranks w16 < w8 < w32 < w64)."""
    deg = np.bincount(np.asarray(receivers, np.int64), minlength=num_nodes)
    best_w, best_cost = candidates[0], np.inf
    for w in candidates:
        vrows = np.maximum(-(-deg // w), 1)
        cost = float(vrows.sum()) * (w + 2.0)
        if cost < best_cost:
            best_w, best_cost = w, cost
    return best_w


def _build_ell_pair(s, r, n, w, width):
    fwd = ell_from_coo(s, r, n, edge_weight=w, width=width)
    bwd = ell_from_coo(r, s, n, edge_weight=w, width=width)
    return fwd, bwd


def build_spmm_plan(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    *,
    edge_weight: Optional[np.ndarray] = None,
    bsr_min_edges: int = 64,
    ell_width: Optional[int] = None,
    force: Optional[str] = None,
    block_dtype=np.float32,
) -> SpmmPlan:
    """Analyze the (already-relabeled, see ``utils/rcm``) COO structure and
    build the best execution plan.  ``force`` pins the method for tests and
    benchmarks ('bsr' | 'ell' | 'hybrid')."""
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    e = senders.shape[0]
    w = (
        np.ones(e, np.float32)
        if edge_weight is None
        else np.asarray(edge_weight, np.float32)
    )

    method = force
    if method is None:
        # decide from block fill: how many edges sit in dense-enough blocks?
        nbcol = max(-(-num_nodes // 128), 1)
        bid = (receivers // 128) * nbcol + senders // 128
        _, inv, counts = np.unique(bid, return_inverse=True, return_counts=True)
        dense_frac = float((counts[inv] >= bsr_min_edges).sum()) / max(e, 1)
        if dense_frac > 0.95:
            method = "bsr"
        elif dense_frac > 0.5:
            method = "hybrid"
        else:
            method = "ell"

    bsr_fwd = bsr_bwd = ell_fwd = ell_bwd = None
    if method in ("bsr", "hybrid"):
        thresh = 1 if method == "bsr" else bsr_min_edges
        bsr_fwd, lo_f = bsr_from_coo(
            senders, receivers, num_nodes,
            edge_weight=w, min_edges_per_block=thresh, dtype=block_dtype,
        )
        bsr_bwd, lo_b = bsr_from_coo(
            receivers, senders, num_nodes,
            edge_weight=w, min_edges_per_block=1, dtype=block_dtype,
        )
        if method == "hybrid" and lo_f.any():
            # residual edges go to the gather path; the backward BSR must
            # then also exclude them (rebuild transpose over the kept set)
            keep = ~lo_f
            bsr_bwd, _ = bsr_from_coo(
                receivers[keep], senders[keep], num_nodes,
                edge_weight=w[keep], min_edges_per_block=1, dtype=block_dtype,
            )
            width = ell_width or pick_ell_width(receivers[lo_f], num_nodes)
            ell_fwd, ell_bwd = _build_ell_pair(
                senders[lo_f], receivers[lo_f], num_nodes, w[lo_f], width
            )
    if method == "ell":
        width = ell_width or pick_ell_width(receivers, num_nodes)
        ell_fwd, ell_bwd = _build_ell_pair(senders, receivers, num_nodes, w, width)

    return SpmmPlan(
        bsr_fwd=bsr_fwd, bsr_bwd=bsr_bwd, ell_fwd=ell_fwd, ell_bwd=ell_bwd,
        num_nodes=num_nodes, method=method,
    )


def build_gcn_plan(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    *,
    edge_weight: Optional[np.ndarray] = None,
    improved: bool = False,
    **plan_kw,
):
    """(plan, self_norm) for ``GCNConv(..., plan=..., plan_self_norm=...)`` —
    bakes the symmetric normalization into the structure, the analog of the
    reference's ``cached=True`` + ``SparseTensor`` fast path
    (``gcn_conv.py:110-130``)."""
    edge_norm, self_norm = gcn_norm_np(
        senders, receivers, num_nodes,
        edge_weight=edge_weight, improved=improved,
    )
    plan = build_spmm_plan(
        senders, receivers, num_nodes, edge_weight=edge_norm, **plan_kw
    )
    return plan, jnp.asarray(self_norm)


def build_mean_plan(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    **plan_kw,
) -> SpmmPlan:
    """Plan computing ``mean_{j∈N(i)} x_j`` (SAGE aggregation) by baking
    ``1/deg`` into the edge weights."""
    receivers = np.asarray(receivers, np.int64)
    deg = np.bincount(receivers, minlength=num_nodes).astype(np.float32)
    w = 1.0 / np.maximum(deg, 1.0)[receivers]
    return build_spmm_plan(senders, receivers, num_nodes, edge_weight=w, **plan_kw)


def gcn_norm_np(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    *,
    edge_weight: Optional[np.ndarray] = None,
    improved: bool = False,
):
    """Host-side ``gcn_norm`` (reference ``gcn_conv.py:30-65``) for plan
    building: returns ``(edge_norm, self_norm)`` numpy arrays matching
    ``ops/norm.gcn_norm``'s analytic-self-loop convention."""
    e = len(senders)
    w = (
        np.ones(e, np.float32)
        if edge_weight is None
        else np.asarray(edge_weight, np.float32)
    )
    c = 2.0 if improved else 1.0
    deg = np.zeros(num_nodes, np.float32)
    np.add.at(deg, receivers, w)
    deg += c
    dinv = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
    edge_norm = dinv[senders] * w * dinv[receivers]
    self_norm = c * dinv * dinv
    return edge_norm.astype(np.float32), self_norm.astype(np.float32)
