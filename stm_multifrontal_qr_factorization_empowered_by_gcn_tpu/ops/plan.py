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

**Degree-sorted relabeling (power-law / skew-degree graphs).**  Banded
graphs get their BSR locality from an RCM relabel done by the caller;
power-law graphs (Reddit/ogbn-style — the regime the reference's
``examples/reddit.py`` NeighborSampler workload lives in) have *degree*
locality instead: sorting nodes by descending degree concentrates the
hub-hub / hub-tail edges into a dense corner of 128x128 blocks.  With
``relabel='auto'`` the planner costs both labelings with a v5e-calibrated
traffic model (dense block ≈ 80 ns of HBM traffic, gathered row ≈ 2.4 ns of
gather-engine occupancy) and, when degree-sorting wins, bakes the
permutation into the plan: ``apply`` runs ``x[perm] → SpMM → out[inv]``
with gather-only forward AND backward (:func:`permute_rows`).  Measured on
a Zipf-1.5 graph (N=131k, E=4.2M): 93 % of edges lower to MXU blocks and
the whole SpMM runs ~5x faster than the gather floor the identity labeling
is stuck at.

Plans are pytrees: safe to close over or pass through ``jit`` boundaries,
with the format choice static.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .bsr import BsrMatrix, bsr_from_coo, spmm_bsr
from .ell import EllGraph, ell_from_coo, spmm_ell

# v5e-calibrated plan-time cost constants, re-measured round 5 on the
# N=131k/E=4.2M dependent-chain benchmark (block + x-window DMA included):
# per-step cost of a [128, bc] block matmul (banded: 3072 steps/1.19 ms at
# bc=128, 2048/0.855 at 256, 1537/1.11 at 512 — the old 620 ns figure for
# 512 underestimated and made the model pick 512 where 256 measures 23 %
# faster), one gathered row for the baked relabel permute (~2.4 ns), and
# one residual tail edge including its share of the w2 gather + flat
# combine kernel (~4.4 ns measured: 366k tail edges cost 0.75 ms gather +
# 0.85 ms combine).
_STEP_NS = {128: 390.0, 256: 420.0, 512: 720.0}
_ROW_NS = 2.4
_TAIL_NS = 4.4


def _break_even_edges(block_cols: int) -> int:
    """Edges a [128, block_cols] block must hold to beat the tail path."""
    return int(np.ceil(_STEP_NS[block_cols] / _TAIL_NS))


@jax.custom_vjp
def permute_rows(x: jnp.ndarray, perm: jnp.ndarray, inv: jnp.ndarray) -> jnp.ndarray:
    """``y[i] = x[perm[i]]`` with a gather-only backward (``g[inv]``) —
    avoids the scatter XLA would otherwise emit for the VJP of a fancy
    index (a permutation's transpose is the inverse permutation)."""
    return x[perm]


def _permute_fwd(x, perm, inv):
    return x[perm], (perm, inv)


def _permute_bwd(res, g):
    perm, inv = res
    return g[inv], jnp.zeros_like(perm), jnp.zeros_like(inv)


permute_rows.defvjp(_permute_fwd, _permute_bwd)


def _apply_parts(x, bsr, ell, num_nodes):
    """Forward-only hybrid apply: dense blocks + gather tail, summed."""
    from .bsr import bsr_matmul
    from .ell import spmm_ell_sum

    out = None
    if bsr is not None:
        out = bsr_matmul(bsr, x)[:num_nodes]
    if ell is not None:
        e = spmm_ell_sum(x, ell)[:num_nodes]
        out = e if out is None else out + e
    if out is None:
        out = jnp.zeros_like(x)
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def spmm_planned(x, fwd_bsr, fwd_ell, bwd_bsr, bwd_ell, num_nodes):
    """Hybrid SpMM whose backward runs an *independently decomposed*
    transpose plan: ``(fwd_bsr, fwd_ell)`` partition A's edges by receiver
    skew, ``(bwd_bsr, bwd_ell)`` partition Aᵀ's edges by *sender* skew —
    the two splits need not correspond (``d/dx (A @ x) = Aᵀ @ g`` holds for
    any decomposition of Aᵀ)."""
    return _apply_parts(x, fwd_bsr, fwd_ell, num_nodes)


def _spmm_planned_fwd(x, fwd_bsr, fwd_ell, bwd_bsr, bwd_ell, num_nodes):
    out = _apply_parts(x, fwd_bsr, fwd_ell, num_nodes)
    return out, (fwd_bsr, fwd_ell, bwd_bsr, bwd_ell)


def _spmm_planned_bwd(num_nodes, res, g):
    fwd_bsr, fwd_ell, bwd_bsr, bwd_ell = res
    zeros = jax.tree_util.tree_map(
        jnp.zeros_like, (fwd_bsr, fwd_ell, bwd_bsr, bwd_ell))
    return (_apply_parts(g, bwd_bsr, bwd_ell, num_nodes), *zeros)


spmm_planned.defvjp(_spmm_planned_fwd, _spmm_planned_bwd)


class SpmmPlan(NamedTuple):
    """Differentiable SpMM executor; ``apply(x) == A @ x`` for the planned
    adjacency (weights baked in at build time).

    When ``perm`` is set the sparse structures live in degree-sorted space;
    chained layers should stay in that frame (:meth:`to_frame` once,
    :meth:`apply_relabeled` per layer, :meth:`from_frame` once) — the
    per-layer permute pairs of :meth:`apply` cancel mathematically.

    **The backward is planned independently of the forward.**  ``d/dx`` of
    an SpMM is the SpMM with Aᵀ, whose skew lives on the *senders* (the
    transpose's receivers): a forward decomposition tuned for receiver skew
    says nothing about how Aᵀ should split.  ``bsr_bwd``/``ell_bwd`` are
    therefore a full hybrid decomposition of the transpose graph — its own
    dense blocks over the same break-even threshold, its own width-tuned
    tail — and :func:`spmm_planned` routes cotangents through it (the
    reference pays symmetric gather+scatter instead,
    ``message_passing.py:124-300``).
    """

    bsr_fwd: Optional[BsrMatrix]
    bsr_bwd: Optional[BsrMatrix]
    ell_fwd: Optional[EllGraph]
    ell_bwd: Optional[EllGraph]
    num_nodes: int
    method: str  # 'bsr' | 'ell' | 'hybrid'
    perm: Optional[jnp.ndarray] = None      # relabeled -> original node id
    inv_perm: Optional[jnp.ndarray] = None  # original -> relabeled node id

    def apply_relabeled(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.method == "hybrid":
            return spmm_planned(
                x, self.bsr_fwd, self.ell_fwd, self.bsr_bwd, self.ell_bwd,
                self.num_nodes,
            )
        out = None
        if self.bsr_fwd is not None:
            out = spmm_bsr(x, self.bsr_fwd, self.bsr_bwd)[: self.num_nodes]
        if self.ell_fwd is not None:
            e = spmm_ell(x, self.ell_fwd, self.ell_bwd)[: self.num_nodes]
            out = e if out is None else out + e
        if out is None:
            out = jnp.zeros_like(x)
        return out

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.perm is None:
            return self.apply_relabeled(x)
        xp = permute_rows(x, self.perm, self.inv_perm)
        out = self.apply_relabeled(xp)
        return permute_rows(out, self.inv_perm, self.perm)

    def to_frame(self, x: jnp.ndarray) -> jnp.ndarray:
        """Relabel ``x`` into the plan's internal node labeling (identity
        when no permutation is baked in).  Chained layers sharing a plan
        should enter the frame once, run :meth:`apply_relabeled` /
        :meth:`apply_relabeled_fused` per layer, and :meth:`from_frame` once
        at the end — adjacent ``apply`` calls' un-permute/permute pairs
        cancel mathematically, so paying them per layer is pure waste
        (measured 1.4 ms/layer of chained-gather cost at the N=131k bench
        shape)."""
        if self.perm is None:
            return x
        return permute_rows(x, self.perm, self.inv_perm)

    def from_frame(self, x: jnp.ndarray) -> jnp.ndarray:
        """Inverse of :meth:`to_frame`."""
        if self.perm is None:
            return x
        return permute_rows(x, self.inv_perm, self.perm)

    def apply_relabeled_fused(self, x: jnp.ndarray, alpha) -> tuple:
        """Frame-local fused epilogue: ``(alpha * (A @ x), sum(out**2))``.

        * pure-BSR plans ride the BSR kernel's resident-window epilogue;
        * hybrid plans fold ``bsr_out + tail_combine`` **and** the epilogue
          into the flat sorted-combine kernel (``init=`` seeds the output
          window with the BSR part — the separate add/scale/sum passes cost
          ~3 feature-matrix HBM passes otherwise);
        * other shapes fall back to ``apply_relabeled`` + XLA elementwise.
        """
        from .ell import _combine_kernel_ok, _ell_gather_sum

        if (
            self.method == "hybrid"
            and self.bsr_fwd is not None
            and self.ell_fwd is not None
            and self.bsr_fwd.num_rows == self.num_nodes
        ):
            part = _ell_gather_sum(x, self.ell_fwd)
            if _combine_kernel_ok(part, self.ell_fwd, "add"):
                from .bsr import bsr_matmul
                from .pallas.segment import combine_sorted_flat_pallas

                y = bsr_matmul(self.bsr_fwd, x)
                out, ss = combine_sorted_flat_pallas(
                    part, self.ell_fwd.rows, self.ell_fwd.step_w,
                    self.ell_fwd.step_c, self.num_nodes,
                    init=y, alpha=alpha,
                )
                return out.astype(x.dtype), ss
        if (
            self.method == "bsr"
            and self.bsr_fwd is not None
            and self.bsr_fwd.num_rows == self.num_nodes
        ):
            from .bsr import bsr_matmul_fused

            return bsr_matmul_fused(self.bsr_fwd, x, alpha)
        y = jnp.asarray(alpha, x.dtype) * self.apply_relabeled(x)
        return y, jnp.sum(y * y)

    def apply_fused(self, x: jnp.ndarray, alpha) -> tuple:
        """Forward-only fused epilogue: ``(alpha * (A @ x), sum(out**2))``.

        The chained-layer normalization pattern (each SpMM's output is
        rescaled by ``rsqrt(mean(y^2)+eps)`` before feeding the next layer)
        restated so the scale rides the NEXT SpMM's MXU accumulate and the
        sum-of-squares is reduced from the kernel's resident output window —
        on the pure-BSR path this costs zero extra HBM passes (the unfused
        form pays ~3 full feature-matrix passes per layer).  Plans with a
        baked permutation pay both permutes here — chained callers should
        use :meth:`to_frame` + :meth:`apply_relabeled_fused` instead."""
        if self.perm is None:
            return self.apply_relabeled_fused(x, alpha)
        y, ss = self.apply_relabeled_fused(
            permute_rows(x, self.perm, self.inv_perm), alpha)
        return permute_rows(y, self.inv_perm, self.perm), ss

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.apply(x)


def _plan_flatten(p: SpmmPlan):
    return (
        (p.bsr_fwd, p.bsr_bwd, p.ell_fwd, p.ell_bwd, p.perm, p.inv_perm),
        (p.num_nodes, p.method),
    )


def _plan_unflatten(aux, children):
    return SpmmPlan(
        *children[:4], num_nodes=aux[0], method=aux[1],
        perm=children[4], inv_perm=children[5],
    )


jax.tree_util.register_pytree_node(SpmmPlan, _plan_flatten, _plan_unflatten)


def pick_ell_width(
    receivers: np.ndarray, num_nodes: int, candidates=(4, 8, 16, 32, 64),
    *, combine_overhead: float = 2.0,
) -> int:
    """Width minimizing estimated HBM cost: gathered slots (the v5e gather
    engine is row-bound at ~370-460M rows/s, benchmark/ell_decompose.py)
    plus ``combine_overhead`` row-equivalents of virtual-row combine +
    accumulate overhead per virtual row.  The default 2.0 is calibrated for
    the XLA scatter combine (on the N=131k/E=4.2M bench shape it correctly
    ranks w16 < w8 < w32 < w64); the Pallas sorted-combine kernel costs
    ~0.5 row-equivalents, which shifts the optimum toward narrower widths
    (fewer padded gather slots)."""
    deg = np.bincount(np.asarray(receivers, np.int64), minlength=num_nodes)
    deg = deg[deg > 0]  # zero-degree rows are dropped by the builder
    best_w, best_cost = candidates[0], np.inf
    for w in candidates:
        vrows = -(-deg // w)
        cost = float(vrows.sum()) * (w + combine_overhead)
        if cost < best_cost:
            best_w, best_cost = w, cost
    return best_w


def _build_ell_pair(s, r, n, w, width, combine_kernel=False):
    fwd = ell_from_coo(
        s, r, n, edge_weight=w, width=width, combine_kernel=combine_kernel)
    bwd = ell_from_coo(
        r, s, n, edge_weight=w, width=width, combine_kernel=combine_kernel)
    return fwd, bwd


def _block_counts(senders, receivers, num_nodes, block_cols=128):
    nbcol = max(-(-num_nodes // block_cols), 1)
    bid = (receivers // 128) * nbcol + senders // block_cols
    uniq, inv, counts = np.unique(bid, return_inverse=True, return_counts=True)
    return counts, inv, uniq, nbcol


def _dup_count(sorted_bids: np.ndarray, nbcol: int) -> int:
    """Consecutive same-x-window steps under ``ops.bsr._window_order``'s
    greedy within-row ordering (each skipped window is a skipped DMA)."""
    brow = sorted_bids // nbcol
    bcol = sorted_bids % nbcol
    starts = np.concatenate(
        [[0], np.nonzero(np.diff(brow))[0] + 1, [len(brow)]])
    dup, prev_last = 0, -1
    for i in range(len(starts) - 1):
        seg = bcol[starts[i]:starts[i + 1]]
        j = int(np.searchsorted(seg, prev_last))
        shared = j < len(seg) and seg[j] == prev_last
        dup += shared
        if shared and len(seg) > 1 and seg[j] == seg[-1]:
            prev_last = int(seg[-2])
        else:
            prev_last = int(seg[-1])
    return dup


def _labeling_cost(senders, receivers, num_nodes, permuted, *,
                   min_edges: Optional[int] = None):
    """v5e traffic-model cost (seconds) of the best hybrid plan under the
    given labeling — minimized over block widths: dense blocks stream as
    MXU block matmuls at the measured per-step cost, residual edges ride
    the gather engine, and a baked permutation adds 2N gathered rows per
    apply.  Returns ``(cost_s, best_block_cols, dense_frac_at_best)``."""
    e = max(len(senders), 1)
    best = (np.inf, 128, 0.0)
    for bc, step_ns in _STEP_NS.items():
        thr = (
            _break_even_edges(bc)
            if min_edges is None
            else max(min_edges * bc // 128, 1)
        )
        counts, inv, uniq, nbcol = _block_counts(
            senders, receivers, num_nodes, bc)
        dense = counts >= thr
        tail_edges = int((~dense[inv]).sum())
        ndense = int(dense.sum())
        # the within-row window ordering (ops/bsr._window_order) skips the
        # x-window DMA — roughly half a step's traffic — on dup steps
        dup = _dup_count(uniq[dense], nbcol) if ndense else 0
        cost = (ndense - 0.5 * dup) * step_ns + tail_edges * _TAIL_NS
        if permuted:
            cost += 2 * num_nodes * _ROW_NS
        if cost < best[0]:
            best = (cost, bc, 1.0 - tail_edges / e)
    return best[0] * 1e-9, best[1], best[2]


def degree_sort_order(senders, receivers, num_nodes) -> np.ndarray:
    """Descending-total-degree node order — the relabel that densifies
    power-law graphs' hub edges into 128x128 blocks (``order[i]`` = original
    id of relabeled node ``i``)."""
    deg = (
        np.bincount(np.asarray(senders, np.int64), minlength=num_nodes)
        + np.bincount(np.asarray(receivers, np.int64), minlength=num_nodes)
    )
    return np.argsort(-deg, kind="stable")


def build_spmm_plan(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    *,
    edge_weight: Optional[np.ndarray] = None,
    bsr_min_edges: Optional[int] = None,
    ell_width: Optional[int] = None,
    force: Optional[str] = None,
    block_dtype=np.float32,
    relabel: Optional[str] = "auto",
    block_cols: Optional[int] = None,
) -> SpmmPlan:
    """Analyze the COO structure and build the best execution plan.

    ``relabel``: ``'auto'`` (default) costs the identity labeling against a
    degree-sorted one and bakes the winner's permutation into the plan;
    ``'degree'`` forces degree-sorting; ``None`` keeps the caller's labels
    (pass graphs already RCM-relabeled via ``utils/rcm`` this way).
    ``block_cols`` pins the BSR block width (128/256/512; default: cost
    model picks).  ``bsr_min_edges`` overrides the hybrid split threshold,
    expressed per 128 block columns (default: the measured break-even).
    ``force`` pins the method for tests and benchmarks
    ('bsr' | 'ell' | 'hybrid')."""
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    e = senders.shape[0]
    w = (
        np.ones(e, np.float32)
        if edge_weight is None
        else np.asarray(edge_weight, np.float32)
    )

    perm = inv_perm = None
    cost_id, bc_id, frac_id = _labeling_cost(
        senders, receivers, num_nodes, False, min_edges=bsr_min_edges
    )
    bc, dense_frac = bc_id, frac_id
    if relabel == "degree" or (relabel == "auto" and e > 0 and force is None):
        order = degree_sort_order(senders, receivers, num_nodes)
        inv = np.empty(num_nodes, np.int64)
        inv[order] = np.arange(num_nodes)
        use_degree = relabel == "degree"
        cost_deg, bc_deg, frac_deg = _labeling_cost(
            inv[senders], inv[receivers], num_nodes, True,
            min_edges=bsr_min_edges,
        )
        if not use_degree:
            # degree-sorting only pays on skew-degree graphs where it beats
            # the identity labeling under the traffic model (incl. the 2N
            # permute rows it costs per apply)
            use_degree = cost_deg < 0.9 * cost_id
        if use_degree:
            senders, receivers = inv[senders], inv[receivers]
            perm = jnp.asarray(order.astype(np.int32))
            inv_perm = jnp.asarray(inv.astype(np.int32))
            bc, dense_frac = bc_deg, frac_deg
    if block_cols is not None:
        bc = block_cols
    split_thr = (
        _break_even_edges(bc)
        if bsr_min_edges is None
        else max(bsr_min_edges * bc // 128, 1)
    )

    method = force
    if method is None:
        # decide from block fill: how many edges sit in dense-enough blocks?
        if dense_frac > 0.95:
            method = "bsr"
        elif dense_frac > 0.5:
            method = "hybrid"
        else:
            method = "ell"
            perm = inv_perm = None  # pure gather gains nothing from relabeling

    bsr_fwd = bsr_bwd = ell_fwd = ell_bwd = None
    if method == "bsr":
        bsr_fwd, _ = bsr_from_coo(
            senders, receivers, num_nodes,
            edge_weight=w, min_edges_per_block=1, dtype=block_dtype,
            block_cols=bc,
        )
        bsr_bwd, _ = bsr_from_coo(
            receivers, senders, num_nodes,
            edge_weight=w, min_edges_per_block=1, dtype=block_dtype,
            block_cols=bc,
        )
    if method == "hybrid":
        from .pallas.segment import pallas_available

        ck = pallas_available()
        widths = (1, 2, 4, 8, 16, 32, 64) if ck else (4, 8, 16, 32, 64)
        ovh = 0.5 if ck else 2.0

        def _decompose(s_dir, r_dir):
            """Independent hybrid split of one direction (dense blocks by
            this direction's own skew + width-tuned gather tail)."""
            mat, lo = bsr_from_coo(
                s_dir, r_dir, num_nodes,
                edge_weight=w, min_edges_per_block=split_thr,
                dtype=block_dtype, block_cols=bc,
            )
            tail = None
            if lo.any():
                width = ell_width or pick_ell_width(
                    r_dir[lo], num_nodes, candidates=widths,
                    combine_overhead=ovh,
                )
                tail = ell_from_coo(
                    s_dir[lo], r_dir[lo], num_nodes,
                    edge_weight=w[lo], width=width, combine_kernel=True,
                )
            return mat, tail

        bsr_fwd, ell_fwd = _decompose(senders, receivers)
        # the transpose's skew lives on the SENDERS — its split is planned
        # from scratch (spmm_planned routes cotangents through it)
        bsr_bwd, ell_bwd = _decompose(receivers, senders)
    if method == "ell":
        # pure-ELL rows are nearly identity (most nodes hold one virtual
        # row); the XLA sorted combine beats the indicator-matmul kernel
        # there (measured 13.2 vs 14.4 ms on the uniform-random bench), so
        # the kernel stays a hybrid-tail specialization
        width = ell_width or pick_ell_width(receivers, num_nodes)
        ell_fwd, ell_bwd = _build_ell_pair(senders, receivers, num_nodes, w, width)

    return SpmmPlan(
        bsr_fwd=bsr_fwd, bsr_bwd=bsr_bwd, ell_fwd=ell_fwd, ell_bwd=ell_bwd,
        num_nodes=num_nodes, method=method, perm=perm, inv_perm=inv_perm,
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
