"""Block-sparse-row (BSR) SpMM — the locality-exploiting MXU fast path.

The reference's hot aggregation is an edge-at-a-time gather + scatter
(``torch_geometric/nn/conv/message_passing.py:124-300``).  On TPU the random
row gather is *transaction*-limited (measured ~525M rows/s on a v5e no matter
the row width or index order — see ``benchmark/microbench_tpu.py``), so any
per-edge formulation caps out near 500M edges/s.  Matrix-structure graphs —
this framework's domain (sparse-matrix nonzero patterns, SURVEY.md §0) —
have locality: after an RCM/ND relabel (``utils/rcm.py``) most edges fall in
a narrow band of 128x128 blocks.  BSR densifies those blocks and turns the
whole aggregation into a short chain of MXU block matmuls:

    out[brow] = sum_j blocks[ptr[brow]+j] @ x[bcol[ptr[brow]+j]]

No gather, no scatter; per-128-row-window cost is ``nblocks_in_row`` fused
(128,128)@(128,F) matmuls streaming at HBM speed.  The Pallas kernel
(``ops/pallas/bsr_kernel.py``) keeps the output window resident in VMEM
across the block loop via revisited grid steps and reads block-column ids
through scalar prefetch.

Blocks with too few edges would waste bandwidth (a dense 128x128 bf16 block
is 32 KB ~ the traffic of ~64 gathered edges), so :func:`bsr_from_coo`
supports a hybrid split: blocks holding >= ``min_edges_per_block`` edges go
to BSR, the long tail stays COO for the gather path (``ops/ell.py``).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BLOCK = 128


class BsrMatrix(NamedTuple):
    """128x128-blocked sparse matrix (rows = receivers, cols = senders).

    * ``blocks`` — ``[nnzb, 128, 128]`` dense block values (``blocks[k][r, c]``
      is the edge weight receiver ``brow_k*128+r`` <- sender ``bcol[k]*128+c``).
    * ``bcol``   — ``[nnzb]`` int32 block-column index per block.
    * ``browf`` — ``[nnzb]`` int32 block-row per block, monotone
      non-decreasing and covering *every* block-row (the builder pads empty
      rows with one zero block) — drives the flat-grid Pallas kernel's
      output window index_map.
    * ``ptr``    — ``[nbrow+1]`` int32 block-row pointers (CSR over blocks).
    * ``num_rows`` / ``num_cols`` — static unpadded node counts.
    """

    blocks: jnp.ndarray
    bcol: jnp.ndarray
    browf: jnp.ndarray
    ptr: jnp.ndarray
    num_rows: int
    num_cols: int
    max_j: int = 1  # static max blocks per block-row (diagnostics)
    uniform_j: int = 0  # static: J when EVERY block-row holds exactly J
                        # blocks (0 otherwise) — enables the one-step-per-
                        # row kernel (J=2: the banded/RCM domain shape)

    @property
    def nnzb(self) -> int:
        return self.blocks.shape[0]

    @property
    def block_cols(self) -> int:
        # blocks are [nnzb, 128, block_cols]; wider blocks double the DMA
        # transfer size (the v5e pipeline runs ~1.4x faster at 128 KiB than
        # 64 KiB) at the price of halved fill per block
        return self.blocks.shape[2]

    @property
    def nbrow(self) -> int:
        return self.ptr.shape[0] - 1

    @property
    def max_blocks_per_row(self) -> int:
        # static (aux) so the value stays concrete when the matrix is
        # traced through custom_vjp / scan boundaries
        return self.max_j


def _bsr_flatten(m: BsrMatrix):
    return (
        (m.blocks, m.bcol, m.browf, m.ptr),
        (m.num_rows, m.num_cols, m.max_j, m.uniform_j),
    )


def _bsr_unflatten(aux, children):
    return BsrMatrix(*children, num_rows=aux[0], num_cols=aux[1],
                     max_j=aux[2], uniform_j=aux[3])


jax.tree_util.register_pytree_node(BsrMatrix, _bsr_flatten, _bsr_unflatten)


def _window_order(ptr: np.ndarray, bcol: np.ndarray) -> np.ndarray:
    """Within-row block permutation that maximizes consecutive flat-grid
    steps sharing an x window.

    The Pallas pipeline only re-DMAs an operand when its block index
    changes between steps, so ordering each block-row to *start* at the
    previous row's last column (when present) and *end* at its highest
    column turns the banded overlap between adjacent rows' windows into
    skipped transfers — on the bench banded graph this removes ~25-33 % of
    the x-window traffic with zero kernel changes.  Any within-row order is
    mathematically identical (browf stays monotone; the out window is keyed
    on browf only)."""
    perm = np.arange(len(bcol), dtype=np.int64)
    prev_last = -1
    for r in range(len(ptr) - 1):
        lo, hi = int(ptr[r]), int(ptr[r + 1])
        if hi - lo > 1:
            seg = bcol[lo:hi]  # ascending (built from sorted block ids)
            j = int(np.searchsorted(seg, prev_last))
            if j < len(seg) and seg[j] == prev_last:
                # start at the shared column, keep the rest ascending
                idx = np.concatenate(
                    [[lo + j], np.delete(np.arange(lo, hi), j)])
                perm[lo:hi] = idx
        if hi > lo:
            prev_last = int(bcol[perm[hi - 1]])
    return perm


def bsr_from_coo(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    *,
    edge_weight: Optional[np.ndarray] = None,
    min_edges_per_block: int = 1,
    dtype=np.float32,
    block_cols: int = BLOCK,
) -> Tuple[BsrMatrix, np.ndarray]:
    """Host-side COO -> (BSR, leftover-edge-mask) conversion.

    Returns the BSR matrix over blocks with at least ``min_edges_per_block``
    edges, plus a boolean mask over the input edges marking the *leftovers*
    (edges in sparser blocks) for a hybrid gather-path residual.
    ``block_cols`` widens blocks to [128, block_cols] (bigger DMAs).
    """
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    e = senders.shape[0]
    w = (
        np.ones(e, np.float32)
        if edge_weight is None
        else np.asarray(edge_weight, np.float32)
    )

    nbrow = max(-(-num_nodes // BLOCK), 1)
    nbcol = max(-(-num_nodes // block_cols), 1)
    brow, bcol = receivers // BLOCK, senders // block_cols
    bid = brow * nbcol + bcol

    uniq, inv, counts = np.unique(bid, return_inverse=True, return_counts=True)
    keep_block = counts >= min_edges_per_block
    leftover_mask = ~keep_block[inv]

    kept_ids = uniq[keep_block]
    # every block-row must hold >= 1 block (the flat-grid Pallas kernel only
    # writes visited output windows) — pad empty rows with one zero block
    present = np.zeros(nbrow, bool)
    present[(kept_ids // nbcol).astype(np.int64)] = True
    pad_ids = np.nonzero(~present)[0].astype(np.int64) * nbcol  # bcol 0
    all_ids = np.sort(np.concatenate([kept_ids, pad_ids]))
    nnzb = len(all_ids)

    # block index within the final (sorted) set, -1 for leftovers
    kpos = np.full(len(uniq), -1, np.int64)
    kpos[keep_block] = np.searchsorted(all_ids, kept_ids)
    epos = kpos[inv]

    blocks = np.zeros((nnzb, BLOCK, block_cols), dtype)
    sel = epos >= 0
    np.add.at(
        blocks,
        (epos[sel], receivers[sel] % BLOCK, senders[sel] % block_cols),
        w[sel].astype(dtype),
    )

    brow_all = (all_ids // nbcol).astype(np.int64)
    bcol_all = (all_ids % nbcol).astype(np.int32)
    ptr = np.zeros(nbrow + 1, np.int64)
    np.add.at(ptr, brow_all + 1, 1)
    ptr = np.cumsum(ptr)  # all_ids are sorted, so blocks are brow-grouped

    perm = _window_order(ptr, bcol_all)
    blocks, bcol_all = blocks[perm], bcol_all[perm]

    row_counts = ptr[1:] - ptr[:-1]
    uniform = 0
    if len(row_counts) and row_counts.min() == row_counts.max():
        uniform = int(row_counts[0])
    return (
        BsrMatrix(
            blocks=jnp.asarray(blocks),
            bcol=jnp.asarray(bcol_all),
            browf=jnp.asarray(brow_all.astype(np.int32)),
            ptr=jnp.asarray(ptr.astype(np.int32)),
            num_rows=num_nodes,
            num_cols=num_nodes,
            max_j=int(max(row_counts.max(initial=0), 1)),
            uniform_j=uniform,
        ),
        leftover_mask,
    )


def bsr_transpose_coo(
    senders: np.ndarray, receivers: np.ndarray, num_nodes: int, **kw
) -> Tuple[BsrMatrix, np.ndarray]:
    """BSR of the transposed graph (drives the backward SpMM)."""
    return bsr_from_coo(receivers, senders, num_nodes, **kw)


# ---------------------------------------------------------------------------
# matmul
# ---------------------------------------------------------------------------

def _pad_rows(x: jnp.ndarray, rows: int) -> jnp.ndarray:
    pad = rows - x.shape[0]
    return jnp.pad(x, ((0, pad), (0, 0))) if pad > 0 else x


def bsr_matmul_xla(m: BsrMatrix, x: jnp.ndarray) -> jnp.ndarray:
    """Reference/CPU path: gather x blocks, batched matmul, segment-sum over
    block-rows.  Mathematically identical to the Pallas kernel."""
    nbrow = m.nbrow
    bc = m.block_cols
    nbcol = max(-(-m.num_cols // bc), 1)
    xp = _pad_rows(x, nbcol * bc).reshape(nbcol, bc, x.shape[1])
    xb = xp[m.bcol]  # [nnzb, block_cols, F]
    prod = jnp.einsum(
        "kij,kjf->kif", m.blocks.astype(x.dtype), xb,
        preferred_element_type=jnp.float32,
    )
    out = jax.ops.segment_sum(prod, m.browf, num_segments=nbrow)
    return out.reshape(nbrow * BLOCK, x.shape[1])[: m.num_rows].astype(x.dtype)


def bsr_matmul(m: BsrMatrix, x: jnp.ndarray, *, interpret: bool = False) -> jnp.ndarray:
    """out[r] = sum_c A[r,c] x[c] over the blocked structure; dispatches to
    the Pallas MXU kernel on TPU (the one-step-per-row paired kernel when
    every block-row holds exactly two blocks — 1.3x on the banded bench
    graph), XLA fallback elsewhere."""
    from .pallas.bsr_kernel import (
        bsr_available, bsr_matmul_pallas, bsr_matmul_uniform2_pallas)

    if bsr_available() or interpret:
        if m.uniform_j == 2:
            return bsr_matmul_uniform2_pallas(m, x, interpret=interpret)
        return bsr_matmul_pallas(m, x, interpret=interpret)
    return bsr_matmul_xla(m, x)


def bsr_matmul_fused(
    m: BsrMatrix, x: jnp.ndarray, alpha, *, interpret: bool = False
):
    """``(alpha * (A @ x), sum((alpha * (A @ x)) ** 2))`` — forward-only.

    On TPU the scale and the sum-of-squares ride the Pallas kernel's
    resident output window (zero extra HBM passes); elsewhere an XLA
    fallback computes the same values. This is the chained-layer
    normalization pattern ``x_{t+1} = y_t * rsqrt(mean(y_t^2) + eps)``
    restated so the normalizer of step t is applied inside step t+1's SpMM
    (``A @ (alpha x) == alpha (A @ x)``)."""
    from .pallas.bsr_kernel import bsr_available, bsr_matmul_fused_pallas

    if bsr_available() or interpret:
        return bsr_matmul_fused_pallas(m, x, alpha, interpret=interpret)
    # match the Pallas contract: out carries x.dtype (a dtype mismatch
    # here breaks scan/fori carries on the fallback path), ss stays f32
    y32 = jnp.asarray(alpha, jnp.float32) * bsr_matmul_xla(
        m, x).astype(jnp.float32)
    return y32.astype(x.dtype), jnp.sum(y32 * y32)


@jax.custom_vjp
def spmm_bsr(x: jnp.ndarray, m_fwd: BsrMatrix, m_bwd: BsrMatrix) -> jnp.ndarray:
    """Differentiable BSR SpMM; ``m_bwd`` must be the transpose structure
    (:func:`bsr_transpose_coo`) and is only touched in the backward pass."""
    return bsr_matmul(m_fwd, x)


def _spmm_bsr_fwd(x, m_fwd, m_bwd):
    return bsr_matmul(m_fwd, x), (m_fwd, m_bwd)


def _spmm_bsr_bwd(res, g):
    m_fwd, m_bwd = res
    zeros = jax.tree_util.tree_map(jnp.zeros_like, (m_fwd, m_bwd))
    return (bsr_matmul(m_bwd, g), *zeros)


spmm_bsr.defvjp(_spmm_bsr_fwd, _spmm_bsr_bwd)


def block_fill_stats(senders, receivers, num_nodes) -> dict:
    """Edges-per-occupied-block stats — drives the BSR-vs-gather dispatch."""
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    nbcol = max(-(-num_nodes // BLOCK), 1)
    bid = (receivers // BLOCK) * nbcol + senders // BLOCK
    _, counts = np.unique(bid, return_counts=True)
    if len(counts) == 0:
        return {"nnzb": 0, "mean_edges_per_block": 0.0, "median": 0.0}
    return {
        "nnzb": int(len(counts)),
        "mean_edges_per_block": float(counts.mean()),
        "median": float(np.median(counts)),
    }
