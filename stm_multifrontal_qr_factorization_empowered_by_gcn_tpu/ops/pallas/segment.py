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
