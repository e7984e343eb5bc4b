"""ELLPACK (padded-CSR) sparse format — the TPU-native SpMM fast path.

The reference's hot aggregation is a COO gather + CUDA scatter-add
(``torch_geometric/nn/conv/message_passing.py:124-300`` via torch-scatter).
On TPU, XLA lowers scatter-adds to a serialized update loop — measured ~15x
slower than the equivalent gather traffic on a v5e.  The TPU-first design
eliminates the scatter entirely:

* Every node's incoming-edge list is padded to a fixed width ``D`` (ELLPACK);
  rows with degree > D are *split* into several virtual rows.
* Aggregation becomes ``width`` unrolled 1-D row gathers accumulated
  elementwise (see :func:`_ell_gather_sum` for why not a single 2-D
  gather+einsum) — **no scatter** — plus (only when splits exist) a tiny
  combine over ~N virtual rows.
* The backward pass never materializes scatter either: ``d/dx`` of an SpMM is
  the SpMM with the *transposed* graph, so the builder prepares both
  directions and a ``jax.custom_vjp`` routes gradients through the reverse
  ELL (the analog of the reference caching ``adj_t``,
  ``torch_geometric/data/sampler.py:57-63``).

Measured on TPU v5e (N=131k, E=4.2M uniform-random, F=128, fp32):
COO+segment_sum 63 ms → ELL 10.5-11.5 ms at the width the cost model in
``ops/plan.pick_ell_width`` selects.  The remaining time is the v5e random
row-gather engine itself (~370-460M rows/s regardless of index order or
width — ``benchmark/ell_decompose.py``), so this is within ~25 % of that
case's physical floor.  Graphs with banded/matrix structure skip ELL
entirely: ``ops/plan.build_spmm_plan`` routes them to the BSR Pallas MXU
kernel (``ops/pallas/bsr_kernel.py``, ~1 ms on the same shape).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class EllGraph(NamedTuple):
    """Padded incoming-neighbor table (receiver-major ELLPACK).

    * ``senders``  — ``[D, V]`` int32 source-node index per slot (0 for
      pads).  Column-major (slot-major) layout: ``senders[k]`` is one
      contiguous column of V indices, which is what keeps the per-column
      gathers streaming (a [V, D] row-major table makes every column slice
      strided and measurably slower on v5e).
    * ``weights``  — ``[D, V]`` float edge weight per slot, 0 for pads (also
      encodes the validity mask).
    * ``rows``     — ``[V]`` int32 receiver node of each virtual row, sorted
      ascending; multiple virtual rows may share a receiver (row splitting).
    * ``num_nodes``    — static N (output rows).
    * ``needs_combine``— static; False when virtual rows == nodes exactly
      (identity ``rows``), letting :func:`spmm_ell` skip the combine.
    * ``step_w``/``step_c`` — optional flat-grid metadata for the Pallas
      sorted-combine kernel (``ops/pallas/segment.combine_sorted_flat_pallas``);
      built by ``ell_from_coo(combine_kernel=True)``.  When present (and the
      feature width is MXU-shaped) the virtual-row combine runs as indicator
      matmuls instead of the XLA scatter path — the scatter costs ~1-2 ms at
      the power-law-tail scale while the kernel runs in ~0.2-0.4 ms.
    """

    senders: jnp.ndarray
    weights: jnp.ndarray
    rows: jnp.ndarray
    num_nodes: int
    needs_combine: bool
    step_w: Optional[jnp.ndarray] = None
    step_c: Optional[jnp.ndarray] = None

    @property
    def num_virtual_rows(self) -> int:
        return self.senders.shape[-1]

    @property
    def width(self) -> int:
        return self.senders.shape[-2]


# register static fields as aux data so EllGraph traces cleanly under jit
def _ell_flatten(g: EllGraph):
    return (
        (g.senders, g.weights, g.rows, g.step_w, g.step_c),
        (g.num_nodes, g.needs_combine),
    )


def _ell_unflatten(aux, children):
    return EllGraph(
        *children[:3], num_nodes=aux[0], needs_combine=aux[1],
        step_w=children[3], step_c=children[4],
    )


jax.tree_util.register_pytree_node(EllGraph, _ell_flatten, _ell_unflatten)


def ell_from_coo(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    *,
    edge_weight: Optional[np.ndarray] = None,
    width: int = 64,
    row_multiple: int = 128,
    min_rows: int = 0,
    force_combine: bool = False,
    drop_empty: Optional[bool] = None,
    combine_kernel: bool = False,
) -> EllGraph:
    """Host-side COO → ELL conversion (one-time per graph, like the
    reference's ``ToSparseTensor`` transform).

    Rows with degree > ``width`` become ``ceil(deg/width)`` virtual rows.
    The virtual-row count is padded up to ``row_multiple`` (and at least
    ``min_rows`` — lets several graphs share one static shape, e.g. for
    stacked minibatches).  ``force_combine`` pins the static combine flag so
    a batch of tables stacks homogeneously.  ``drop_empty`` removes the
    virtual rows of degree-0 receivers (default: auto — engaged when >25 %
    of nodes are empty, the hybrid-plan residual case, where keeping them
    would more than double the gathered slots; kept otherwise so the
    combine-free identity-rows fast path stays available).
    ``combine_kernel`` pads the virtual-row count to the Pallas combine
    kernel's chunk multiple and attaches its flat-grid step metadata (see
    :class:`EllGraph`).
    """
    senders = np.asarray(senders, np.int32)
    receivers = np.asarray(receivers, np.int32)
    e = senders.shape[0]
    w = (
        np.ones(e, np.float32)
        if edge_weight is None
        else np.asarray(edge_weight, np.float32)
    )

    order = np.argsort(receivers, kind="stable")
    s_sorted, r_sorted, w_sorted = senders[order], receivers[order], w[order]

    deg = np.bincount(r_sorted, minlength=num_nodes)
    if drop_empty is None:
        drop_empty = num_nodes > 0 and float((deg == 0).mean()) > 0.25
    vrows_per_node = (deg + width - 1) // width
    if not drop_empty:
        vrows_per_node = np.maximum(vrows_per_node, 1)
    v = int(vrows_per_node.sum())
    if combine_kernel:
        from .pallas.segment import CHUNK as _CCHUNK

        row_multiple = max(row_multiple, _CCHUNK)
    v_pad = int(-(-max(v, 1, min_rows) // row_multiple) * row_multiple)

    ell_s = np.zeros((v_pad, width), np.int32)
    ell_w = np.zeros((v_pad, width), np.float32)
    rows = np.full(v_pad, num_nodes - 1, np.int32)

    vstart = np.concatenate([[0], np.cumsum(vrows_per_node)])
    estart = np.concatenate([[0], np.cumsum(deg)])
    # vectorized fill: edge e (receiver-sorted) lands at virtual row
    # vstart[r] + rank//width, slot rank%width, rank = position within r's list
    if e > 0:
        rank = np.arange(e, dtype=np.int64) - estart[r_sorted]
        vrow = vstart[r_sorted] + rank // width
        slot = rank % width
        ell_s[vrow, slot] = s_sorted
        ell_w[vrow, slot] = w_sorted
    # receiver of every virtual row (repeat n, vrows_per_node[n] times)
    rows[:v] = np.repeat(
        np.arange(num_nodes, dtype=np.int32), vrows_per_node
    )

    needs_combine = force_combine or not (
        v_pad == num_nodes and np.array_equal(rows[:v], np.arange(num_nodes))
    )
    step_w = step_c = None
    if combine_kernel and needs_combine:
        from .pallas.segment import combine_steps_host

        sw, sc = combine_steps_host(rows, num_nodes)
        step_w, step_c = jnp.asarray(sw), jnp.asarray(sc)
    return EllGraph(
        senders=jnp.asarray(np.ascontiguousarray(ell_s.T)),
        weights=jnp.asarray(np.ascontiguousarray(ell_w.T)),
        rows=jnp.asarray(rows),
        num_nodes=num_nodes,
        needs_combine=needs_combine,
        step_w=step_w,
        step_c=step_c,
    )


def ell_pair_from_coo(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    *,
    edge_weight: Optional[np.ndarray] = None,
    width: int = 64,
    row_multiple: int = 128,
) -> Tuple[EllGraph, EllGraph]:
    """(forward, transpose) ELL pair; the transpose drives the backward SpMM."""
    fwd = ell_from_coo(
        senders, receivers, num_nodes,
        edge_weight=edge_weight, width=width, row_multiple=row_multiple,
    )
    bwd = ell_from_coo(
        receivers, senders, num_nodes,
        edge_weight=edge_weight, width=width, row_multiple=row_multiple,
    )
    return fwd, bwd


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------

def _ell_gather_sum(x: jnp.ndarray, ell: EllGraph) -> jnp.ndarray:
    """[V, F] weighted neighbor sums — fused gather+reduce, scatter-free.

    Written as ``width`` unrolled *column-slice* gathers (each a plain 1-D
    row gather) accumulated elementwise.  On v5e the single [V, D] table
    gather + einsum formulation runs ~8x slower (~2.6 GB/s-equiv) than this
    unrolled form, which streams at ~520 GB/s — the 2-D gather defeats
    XLA's fast gather lowering (measured in benchmark/spmm_shootout.py).
    """
    acc = None
    for k in range(ell.width):
        g = x[ell.senders[k]].astype(jnp.float32)
        g = g * ell.weights[k].astype(jnp.float32)[:, None]
        acc = g if acc is None else acc + g
    return acc.astype(x.dtype)


def _combine_kernel_ok(part: jnp.ndarray, ell: EllGraph, aggr: str) -> bool:
    from .pallas.segment import CHUNK, pallas_available

    return (
        ell.step_w is not None
        and aggr in ("add", "sum", "mean")
        and part.ndim == 2
        and part.shape[0] % CHUNK == 0
        and part.shape[1] % 128 == 0
        and part.dtype == jnp.float32
        and pallas_available()
    )


def _combine(part: jnp.ndarray, ell: EllGraph, aggr: str) -> jnp.ndarray:
    if not ell.needs_combine:
        return part
    if _combine_kernel_ok(part, ell, aggr):
        from .pallas.segment import combine_sorted_flat_pallas

        return combine_sorted_flat_pallas(
            part, ell.rows, ell.step_w, ell.step_c, ell.num_nodes
        )
    from .segment import aggregate

    return aggregate(
        aggr if aggr != "mean" else "add",
        part, ell.rows, ell.num_nodes, indices_are_sorted=True,
    )


def spmm_ell_sum(x: jnp.ndarray, ell: EllGraph) -> jnp.ndarray:
    """``out[i] = sum_j w_ij x_j`` over the ELL structure (gather + virtual-row combine; no scatter)."""
    return _combine(_ell_gather_sum(x, ell), ell, "add")


def spmm_ell_mean(x: jnp.ndarray, ell: EllGraph) -> jnp.ndarray:
    """Per-receiver mean over the ELL structure (nonzero-weight slots counted)."""
    total = spmm_ell_sum(x, ell)
    cnt = _combine(
        jnp.sum((ell.weights != 0).astype(x.dtype), axis=0)[:, None],
        ell, "add",
    )
    return total / jnp.maximum(cnt, 1)


def spmm_ell_max(x: jnp.ndarray, ell: EllGraph) -> jnp.ndarray:
    """Per-receiver max over the ELL structure; empty receivers yield 0."""
    neg = jnp.array(-jnp.inf, x.dtype)
    part = None
    for k in range(ell.width):  # column-slice gathers (see _ell_gather_sum)
        g = x[ell.senders[k]]
        g = jnp.where((ell.weights[k] != 0)[:, None], g, neg)
        part = g if part is None else jnp.maximum(part, g)
    out = _combine(part, ell, "max")
    return jnp.where(jnp.isneginf(out), jnp.zeros_like(out), out)


# ---------------------------------------------------------------------------
# differentiable sum-SpMM: backward = transpose-graph SpMM (scatter-free)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def spmm_ell(x: jnp.ndarray, ell_fwd: EllGraph, ell_bwd: EllGraph) -> jnp.ndarray:
    """out[r] = sum_{e: recv(e)=r} w_e * x[send(e)] with scatter-free fwd+bwd.

    ``ell_bwd`` must be the transpose graph (:func:`ell_pair_from_coo`); it is
    only touched in the backward pass.
    """
    return spmm_ell_sum(x, ell_fwd)


def _spmm_fwd(x, ell_fwd, ell_bwd):
    return spmm_ell_sum(x, ell_fwd), (ell_fwd, ell_bwd)


def _zero_tangent(ell: EllGraph):
    return jax.tree_util.tree_map(jnp.zeros_like, ell)


def _spmm_bwd(res, g):
    ell_fwd, ell_bwd = res
    return spmm_ell_sum(g, ell_bwd), _zero_tangent(ell_fwd), _zero_tangent(ell_bwd)


spmm_ell.defvjp(_spmm_fwd, _spmm_bwd)


# ---------------------------------------------------------------------------
# dynamic-edge-weight (attention) ELL: weights come in per forward pass
# ---------------------------------------------------------------------------

class EllAttn(NamedTuple):
    """ELL table whose per-slot weights are *gathered at run time* from a
    dense per-edge array (attention alphas, edge-MLP outputs, …) instead of
    being baked in at build time.

    This is the scatter-free aggregation path for attention convs (GAT,
    GATv2, Transformer) — the reference runs these through torch-scatter's
    CUDA scatter-add on [E, H, F] messages
    (``torch_geometric/nn/conv/gat_conv.py:142-146`` via
    ``MessagePassing.aggregate``).  Here the per-edge weight is looked up by
    ``edge_ids`` (pad slots point one-past-the-end at a zero row), so the
    whole weighted SpMM stays unrolled row gathers + elementwise FMA.

    Fields mirror :class:`EllGraph`; ``edge_ids`` replaces ``weights``.
    """

    senders: jnp.ndarray   # [D, V] int32 source node per slot (0 for pads)
    edge_ids: jnp.ndarray  # [D, V] int32 edge index per slot (E for pads)
    rows: jnp.ndarray      # [V] receiver per virtual row
    num_nodes: int
    needs_combine: bool

    @property
    def width(self) -> int:
        return self.senders.shape[-2]


def _ell_attn_flatten(g: EllAttn):
    return (g.senders, g.edge_ids, g.rows), (g.num_nodes, g.needs_combine)


def _ell_attn_unflatten(aux, children):
    return EllAttn(*children, num_nodes=aux[0], needs_combine=aux[1])


jax.tree_util.register_pytree_node(EllAttn, _ell_attn_flatten, _ell_attn_unflatten)


def ell_attn_from_coo(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    *,
    width: int = 16,
    row_multiple: int = 128,
) -> EllAttn:
    """Host-side COO → attention-ELL conversion.  ``edge_ids`` keep the
    *original* edge numbering so run-time ``alpha[e]`` arrays line up."""
    senders = np.asarray(senders, np.int32)
    receivers = np.asarray(receivers, np.int32)
    e = senders.shape[0]

    order = np.argsort(receivers, kind="stable")
    s_sorted, r_sorted = senders[order], receivers[order]

    deg = np.bincount(r_sorted, minlength=num_nodes)
    vrows_per_node = np.maximum((deg + width - 1) // width, 1)
    v = int(vrows_per_node.sum())
    v_pad = int(-(-max(v, 1) // row_multiple) * row_multiple)

    ell_s = np.zeros((v_pad, width), np.int32)
    ell_e = np.full((v_pad, width), e, np.int32)  # pad → one-past-end
    rows = np.full(v_pad, num_nodes - 1, np.int32)

    vstart = np.concatenate([[0], np.cumsum(vrows_per_node)])
    estart = np.concatenate([[0], np.cumsum(deg)])
    if e > 0:
        rank = np.arange(e, dtype=np.int64) - estart[r_sorted]
        vrow = vstart[r_sorted] + rank // width
        slot = rank % width
        ell_s[vrow, slot] = s_sorted
        ell_e[vrow, slot] = order
    rows[:v] = np.repeat(np.arange(num_nodes, dtype=np.int32), vrows_per_node)

    needs_combine = not (
        v_pad == num_nodes and np.array_equal(rows[:v], np.arange(num_nodes))
    )
    return EllAttn(
        senders=jnp.asarray(np.ascontiguousarray(ell_s.T)),
        edge_ids=jnp.asarray(np.ascontiguousarray(ell_e.T)),
        rows=jnp.asarray(rows),
        num_nodes=num_nodes,
        needs_combine=needs_combine,
    )


def ell_attn_pair_from_coo(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    *,
    width: int = 16,
    row_multiple: int = 128,
) -> Tuple[EllAttn, EllAttn]:
    """(forward, transpose) attention-ELL pair.  Both tables index the *same*
    original edge array, so one run-time ``alpha`` drives both directions."""
    fwd = ell_attn_from_coo(
        senders, receivers, num_nodes, width=width, row_multiple=row_multiple
    )
    bwd = ell_attn_from_coo(
        receivers, senders, num_nodes, width=width, row_multiple=row_multiple
    )
    return fwd, bwd


def _ell_attn_gather_sum(
    x: jnp.ndarray, alpha_ext: jnp.ndarray, ell: EllAttn
) -> jnp.ndarray:
    """sum_k alpha[eid_k] * x[send_k] over slots; x [N, ...F], alpha_ext
    [E+1, ...H] (last row zero).  Broadcasting: alpha gains trailing dims to
    match x's feature axes."""
    acc = None
    for k in range(ell.width):
        g = x[ell.senders[k]].astype(jnp.float32)
        w = alpha_ext[ell.edge_ids[k]].astype(jnp.float32)
        w = w.reshape(w.shape + (1,) * (g.ndim - w.ndim))
        g = g * w
        acc = g if acc is None else acc + g
    return acc.astype(x.dtype)


def _attn_combine(part: jnp.ndarray, ell: EllAttn) -> jnp.ndarray:
    if not ell.needs_combine:
        return part
    from .segment import aggregate

    return aggregate(
        "add", part, ell.rows, ell.num_nodes, indices_are_sorted=True
    )


def _pad_zero_row(alpha: jnp.ndarray) -> jnp.ndarray:
    pad = jnp.zeros((1,) + alpha.shape[1:], alpha.dtype)
    return jnp.concatenate([alpha, pad], axis=0)


@jax.custom_vjp
def spmm_ell_attn(
    x: jnp.ndarray,
    alpha: jnp.ndarray,
    ell_fwd: EllAttn,
    ell_bwd: EllAttn,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
) -> jnp.ndarray:
    """out[r] = Σ_{e: recv(e)=r} alpha[e] · x[send(e)] — differentiable in
    both ``x`` and ``alpha`` with *no scatter anywhere*:

    * forward: unrolled ELL gathers weighted by gathered alphas;
    * ∂x: the transpose-graph attention SpMM (``ell_bwd``);
    * ∂alpha: an SDDMM — ``dα_e = Σ_F gout[recv(e)] · x[send(e)]`` — two row
      gathers and a dot (``ops/sddmm.py`` role).

    ``x``: [N, F] or [N, H, F]; ``alpha``: [E] or [E, H] respectively.
    """
    return _attn_combine(_ell_attn_gather_sum(x, _pad_zero_row(alpha), ell_fwd), ell_fwd)


def _spmm_attn_fwd(x, alpha, ell_fwd, ell_bwd, senders, receivers):
    out = _attn_combine(
        _ell_attn_gather_sum(x, _pad_zero_row(alpha), ell_fwd), ell_fwd
    )
    return out, (x, alpha, ell_fwd, ell_bwd, senders, receivers)


def _spmm_attn_bwd(res, gout):
    x, alpha, ell_fwd, ell_bwd, senders, receivers = res
    dx = _attn_combine(
        _ell_attn_gather_sum(gout, _pad_zero_row(alpha), ell_bwd), ell_bwd
    ).astype(x.dtype)
    # SDDMM: per-edge <gout[r], x[s]> reduced over the trailing feature axis
    dalpha = jnp.sum(
        gout[receivers].astype(jnp.float32) * x[senders].astype(jnp.float32),
        axis=-1,
    ).astype(alpha.dtype)
    zf = jax.tree_util.tree_map(jnp.zeros_like, ell_fwd)
    zb = jax.tree_util.tree_map(jnp.zeros_like, ell_bwd)
    return dx, dalpha, zf, zb, jnp.zeros_like(senders), jnp.zeros_like(receivers)


spmm_ell_attn.defvjp(_spmm_attn_fwd, _spmm_attn_bwd)


def ell_pairs_for_batches(
    stacked_g, *, width: int = 64, row_multiple: int = 128
) -> Tuple[EllGraph, EllGraph]:
    """(forward, transpose) ELL tables for a *stacked* padded-batch Graph
    (leading batch axis, e.g. from ``train.scan_trainer.make_padded_batches``)
    — every batch's table padded to one common shape so the result stacks
    into pytrees indexable per step inside ``lax.scan``.  Only valid edges
    enter the tables (padding edges vanish instead of needing masks)."""
    import jax as _jax

    nb = stacked_g.n_node.shape[0]
    n_pad = stacked_g.nodes.shape[1]
    senders = np.asarray(stacked_g.senders)
    receivers = np.asarray(stacked_g.receivers)
    n_edge = np.asarray(stacked_g.n_edge)

    # first pass: find the max virtual-row count either direction needs
    def _rows_needed(idx, fwd):
        ne = int(n_edge[idx].sum())
        recv = receivers[idx, :ne] if fwd else senders[idx, :ne]
        deg = np.bincount(recv, minlength=n_pad)
        return int(np.maximum((deg + width - 1) // width, 1).sum())

    v_need = max(
        max(_rows_needed(i, True) for i in range(nb)),
        max(_rows_needed(i, False) for i in range(nb)),
    )

    fwds, bwds = [], []
    for i in range(nb):
        ne = int(n_edge[i].sum())
        s, r = senders[i, :ne], receivers[i, :ne]
        fwds.append(
            ell_from_coo(
                s, r, n_pad, width=width, row_multiple=row_multiple,
                min_rows=v_need, force_combine=True,
            )
        )
        bwds.append(
            ell_from_coo(
                r, s, n_pad, width=width, row_multiple=row_multiple,
                min_rows=v_need, force_combine=True,
            )
        )

    def _stack(*leaves):
        return np.stack([np.asarray(l) for l in leaves], axis=0)

    return (
        _jax.tree_util.tree_map(_stack, *fwds),
        _jax.tree_util.tree_map(_stack, *bwds),
    )
