"""Pallas TPU kernel: segment-sum over receiver-sorted edges.

XLA lowers scatter/segment-sum on TPU to a serialized update loop — measured
61 ms for E=4.2M, F=128 on a v5e while the same traffic gathers in ~12 ms.
This kernel removes the scatter entirely:

* output rows are processed in 128-row *windows* (grid dim 0);
* each window's edge range [wptr[w], wptr[w+1]) is covered by fixed-size
  edge chunks (grid dim 1); the chunk's msg rows stream HBM→VMEM through the
  normal Pallas pipeline — the data-dependent chunk position comes from a
  **scalar-prefetched window pointer** used inside the BlockSpec index_map;
* in-chunk reduction is an indicator matmul on the MXU:
  ``acc[128, F] += onehot(r_chunk − 128w)[128, CE] @ msg[CE, F]`` —
  per-edge cost 128·F·2 flops, no serial per-edge work anywhere;
* the output block stays resident in VMEM across the chunk dimension
  (revisited grid steps), written once per window.

Requires receivers sorted ascending (the collater's CSR layout).  Padding
edges (receiver == num_nodes-1 by the Graph contract) land in the last
window and are masked by the caller's edge weights/mask upstream.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas is TPU/Mosaic-only; import lazily for CPU test environments
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

WINDOW = 128          # output rows per window (MXU-aligned)
CHUNK = 1024          # edges per chunk (int32 1-D XLA tile T(1024) alignment)


def pallas_available() -> bool:
    if not _PALLAS_OK:
        return False
    return jax.default_backend() in ("tpu", "axon")


def _kernel(wptr_ref, r_ref, msg_ref, out_ref):
    w = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    start = wptr_ref[w]
    end = wptr_ref[w + 1]
    base = (start // CHUNK + c) * CHUNK  # this chunk's first edge index

    @pl.when(base < end)
    def _():
        pos = base + jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        in_range = (pos >= start) & (pos < end)          # [1, CE]
        local = r_ref[...].reshape(1, CHUNK) - w * WINDOW  # [1, CE]
        rows = jax.lax.broadcasted_iota(jnp.int32, (WINDOW, CHUNK), 0)
        indicator = jnp.where(
            in_range & (local == rows), jnp.float32(1), jnp.float32(0)
        )
        out_ref[...] += jax.lax.dot_general(
            indicator,
            msg_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # full fp32 accuracy: default MXU f32 path truncates operands to
            # bf16 (measured 1e-2-relative error); HIGHEST = multi-pass bf16
            precision=jax.lax.Precision.HIGHEST,
        ).astype(out_ref.dtype)


def segment_sum_sorted_pallas(
    msg: jnp.ndarray,
    receivers: jnp.ndarray,
    num_nodes: int,
    *,
    max_chunks: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[n] = Σ_{e: receivers[e]=n} msg[e]; receivers sorted ascending.

    ``num_nodes`` is rounded up to a multiple of 128 internally; the caller
    gets the first ``num_nodes`` rows.  ``max_chunks`` bounds the per-window
    chunk count (default: enough for the worst window; pass a static value
    from the host when known, e.g. ceil(max_window_edges / CHUNK) + 1).
    """
    e, f = msg.shape
    if e % CHUNK != 0:
        raise ValueError(f"edge count {e} must be a multiple of {CHUNK}")
    n_pad = -(-num_nodes // WINDOW) * WINDOW
    num_windows = n_pad // WINDOW

    # window pointers: first edge of each 128-row window (device-side
    # searchsorted — O(N log E), fused by XLA, negligible)
    boundaries = jnp.arange(num_windows + 1, dtype=jnp.int32) * WINDOW
    wptr = jnp.searchsorted(receivers, boundaries, side="left").astype(jnp.int32)

    if max_chunks is None:
        try:
            # concrete receivers: exact worst-window chunk span (host-side)
            r_np = np.asarray(receivers)
            wp = np.searchsorted(r_np, np.arange(num_windows + 1) * WINDOW)
            spans = np.maximum(wp[1:] - 1, wp[:-1]) // CHUNK - wp[:-1] // CHUNK + 1
            max_chunks = int(spans.max(initial=1))
        except Exception:
            # traced: generous static bound — callers under jit should pass
            # max_chunks explicitly to avoid the extra masked iterations
            max_chunks = int(np.ceil(e / CHUNK / max(num_windows, 1))) * 8 + 2

    nblocks = e // CHUNK

    def _blk(w, c, wptr):
        # clamp: windows near the edge-array end would otherwise index past
        # the last chunk (the kernel's base<end guard masks the stale data)
        return jnp.minimum(wptr[w] // CHUNK + c, nblocks - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_windows, max_chunks),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda w, c, wptr: (_blk(w, c, wptr),)),
            pl.BlockSpec((CHUNK, f), lambda w, c, wptr: (_blk(w, c, wptr), 0)),
        ],
        out_specs=pl.BlockSpec((WINDOW, f), lambda w, c, wptr: (w, 0)),
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, f), msg.dtype),
        interpret=interpret,
    )(wptr, receivers, msg)
    return out[:num_nodes]


# ---------------------------------------------------------------------------
# flat-grid sorted combine — the ELL virtual-row reduction
# ---------------------------------------------------------------------------
#
# The rectangular (window, chunk) grid above sizes every window for the
# WORST window's chunk span; under hub skew (degree-sorted power-law tails,
# where the densest window holds ~40x the median) that wastes most steps.
# The flat variant precomputes one (window, chunk) pair per USEFUL step on
# the host (the ELL structure is static per plan) — the exact analog of the
# BSR kernel's flat browf grid (``ops/pallas/bsr_kernel.py``).
#
# In-chunk reduction stays an indicator matmul, but *two-pass bf16* instead
# of ``Precision.HIGHEST`` (~6 passes): the 0/1 indicator is exactly
# representable in bf16, and the f32 values are split into two bf16 terms
# covering 16 mantissa bits (``v ≈ hi + lo``), so ``I @ hi + I @ lo``
# carries a ~2^-17 relative residue — measured ≤2e-4 over 1024-long hub
# runs, an order below the ~1e-3 the MXU's default-precision f32 path
# already injects in the BSR blocks this combine is summed with (a third
# pass recovers full f32 exactness but costs 1.5x the kernel's dominant
# compute; rejected after measuring both).
#
# ``init`` (optional) seeds each output window instead of zeros — this is
# how the hybrid SpMM folds ``bsr_out + tail_combine`` into one pass
# (``ops/plan.SpmmPlan.apply_relabeled_fused``), and the fused variant adds
# the chained-layer alpha/sum-of-squares epilogue of
# ``bsr_kernel._kernel_fused``.


def _split_hi_lo(v):
    hi = v.astype(jnp.bfloat16)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _indicator(rows_ref, w, window, chunk):
    local = rows_ref[...].reshape(1, chunk) - w * window
    rowiota = jax.lax.broadcasted_iota(jnp.int32, (window, chunk), 0)
    return (local == rowiota).astype(jnp.bfloat16)


def _acc_chunk(out_ref, rows_ref, part_ref, w, window, chunk):
    ind = _indicator(rows_ref, w, window, chunk)
    hi, lo = _split_hi_lo(part_ref[...])
    dn = (((1,), (0,)), ((), ()))
    out_ref[...] += jax.lax.dot_general(
        ind, hi, dimension_numbers=dn, preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        ind, lo, dimension_numbers=dn, preferred_element_type=jnp.float32,
    )


def _ckernel(stepw_ref, stepc_ref, rows_ref, part_ref, out_ref):
    k = pl.program_id(0)
    w = stepw_ref[k]
    first = jnp.logical_or(k == 0, stepw_ref[jnp.maximum(k - 1, 0)] != w)

    @pl.when(first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    _acc_chunk(out_ref, rows_ref, part_ref, w, WINDOW, CHUNK)


def _ckernel_init(stepw_ref, stepc_ref, rows_ref, init_ref, part_ref, out_ref):
    k = pl.program_id(0)
    w = stepw_ref[k]
    first = jnp.logical_or(k == 0, stepw_ref[jnp.maximum(k - 1, 0)] != w)

    @pl.when(first)
    def _():
        out_ref[...] = init_ref[...].astype(jnp.float32)

    _acc_chunk(out_ref, rows_ref, part_ref, w, WINDOW, CHUNK)


def _ckernel_init_fused(stepw_ref, stepc_ref, alpha_ref, rows_ref, init_ref,
                        part_ref, out_ref, ss_ref):
    k = pl.program_id(0)
    nk = pl.num_programs(0)
    w = stepw_ref[k]
    first = jnp.logical_or(k == 0, stepw_ref[jnp.maximum(k - 1, 0)] != w)

    @pl.when(first)
    def _():
        out_ref[...] = init_ref[...].astype(jnp.float32)

    _acc_chunk(out_ref, rows_ref, part_ref, w, WINDOW, CHUNK)

    last = jnp.logical_or(k == nk - 1, stepw_ref[jnp.minimum(k + 1, nk - 1)] != w)

    @pl.when(last)
    def _():
        o = alpha_ref[0, 0] * out_ref[...]
        out_ref[...] = o
        s = jnp.sum(o * o, axis=0)
        # (1, 8, F) tile: sublane 0 carries the partial, rest zero-padded to
        # meet the (8, 128) output-tile rule; iota mask because .at[].set
        # lowers to scatter (unimplemented in Mosaic)
        sub = jax.lax.broadcasted_iota(jnp.int32, ss_ref.shape, 1)
        ss_ref[...] = jnp.where(sub == 0, s[None, None, :], 0.0)


def combine_steps_host(rows: np.ndarray, num_nodes: int):
    """Host-side flat-grid metadata for :func:`combine_sorted_flat_pallas`.

    ``rows`` — [V] sorted receiver of every virtual row, V % CHUNK == 0.
    Returns int32 ``(step_window, step_chunk)``; every 128-row output window
    gets at least one step (so its window is always initialized/written),
    and a window's steps cover exactly the chunks its rows span.
    """
    rows = np.asarray(rows)
    nwin = -(-num_nodes // WINDOW)
    wptr = np.searchsorted(rows, np.arange(nwin + 1) * WINDOW).astype(np.int64)
    c0 = wptr[:-1] // CHUNK
    c1 = np.maximum(wptr[1:] - 1, wptr[:-1]) // CHUNK
    counts = (c1 - c0 + 1).astype(np.int64)
    step_w = np.repeat(np.arange(nwin, dtype=np.int32), counts)
    base = np.repeat(c0.astype(np.int32), counts)
    offs = np.arange(len(step_w), dtype=np.int32) - np.repeat(
        np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32), counts
    )
    step_c = base + offs
    nblocks = max(len(rows) // CHUNK, 1)
    np.minimum(step_c, nblocks - 1, out=step_c)
    return step_w, step_c


def combine_sorted_flat_pallas(
    part: jnp.ndarray,
    rows: jnp.ndarray,
    step_w: jnp.ndarray,
    step_c: jnp.ndarray,
    num_nodes: int,
    *,
    init: Optional[jnp.ndarray] = None,
    alpha=None,
    interpret: bool = False,
):
    """``out[n] = init[n] + Σ_{v: rows[v]=n} part[v]`` over sorted runs.

    ``part`` [V, F] f32 with V % CHUNK == 0; ``rows`` [V] int32 sorted;
    ``step_w``/``step_c`` from :func:`combine_steps_host`.  With ``alpha``
    also returns ``sum((alpha*out)**2)`` reduced from the resident windows
    (the chained-layer epilogue) and scales the output by ``alpha``.
    """
    v, f = part.shape
    if v % CHUNK != 0:
        raise ValueError(f"virtual rows {v} must be a multiple of {CHUNK}")
    n_pad = -(-num_nodes // WINDOW) * WINDOW
    nsteps = step_w.shape[0]

    if alpha is not None:
        if init is None:
            init = jnp.zeros((n_pad, f), jnp.float32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # alpha (1, 1)
                pl.BlockSpec((CHUNK,), lambda k, sw, sc: (sc[k],)),
                pl.BlockSpec((WINDOW, f), lambda k, sw, sc: (sw[k], 0)),
                pl.BlockSpec((CHUNK, f), lambda k, sw, sc: (sc[k], 0)),
            ],
            out_specs=[
                pl.BlockSpec((WINDOW, f), lambda k, sw, sc: (sw[k], 0)),
                pl.BlockSpec((1, 8, f), lambda k, sw, sc: (sw[k], 0, 0)),
            ],
        )
        out, ss = pl.pallas_call(
            _ckernel_init_fused,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((n_pad, f), jnp.float32),
                jax.ShapeDtypeStruct((n_pad // WINDOW, 8, f), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(step_w, step_c,
          jnp.asarray(alpha, jnp.float32).reshape(1, 1),
          rows, _pad_rows_to(init, n_pad), part)
        return out[:num_nodes], jnp.sum(ss)

    if init is not None:
        kernel, inputs = _ckernel_init, (rows, _pad_rows_to(init, n_pad), part)
        in_specs = [
            pl.BlockSpec((CHUNK,), lambda k, sw, sc: (sc[k],)),
            pl.BlockSpec((WINDOW, f), lambda k, sw, sc: (sw[k], 0)),
            pl.BlockSpec((CHUNK, f), lambda k, sw, sc: (sc[k], 0)),
        ]
    else:
        kernel, inputs = _ckernel, (rows, part)
        in_specs = [
            pl.BlockSpec((CHUNK,), lambda k, sw, sc: (sc[k],)),
            pl.BlockSpec((CHUNK, f), lambda k, sw, sc: (sc[k], 0)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((WINDOW, f), lambda k, sw, sc: (sw[k], 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(step_w, step_c, *inputs)
    return out[:num_nodes]


def _pad_rows_to(x: jnp.ndarray, rows: int) -> jnp.ndarray:
    pad = rows - x.shape[0]
    return jnp.pad(x, ((0, pad), (0, 0))) if pad > 0 else x


def spmm_coo_sorted_pallas(
    x: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    num_nodes: int,
    *,
    edge_weight: Optional[jnp.ndarray] = None,
    edge_mask: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Gather (XLA — already near its random-access limit) + Pallas windowed
    segment reduce.  Drop-in for ``spmm_coo`` when receivers are sorted."""
    msg = x[senders]
    if edge_weight is not None:
        msg = msg * edge_weight[:, None]
    if edge_mask is not None:
        msg = jnp.where(edge_mask[:, None], msg, 0)
    e = msg.shape[0]
    pad = (-e) % CHUNK
    if pad:
        msg = jnp.pad(msg, ((0, pad), (0, 0)))
        receivers = jnp.pad(receivers, (0, pad), constant_values=num_nodes - 1)
        # padded msg rows are zero -> harmless wherever they land
    return segment_sum_sorted_pallas(msg, receivers, num_nodes, interpret=interpret)
