"""Pallas TPU kernel: BSR SpMM on the MXU.

Grid = one step per *stored block* (flat), in block-row-major order.  The
output 128-row window is revisited across consecutive same-row steps so it
stays resident in VMEM and is written to HBM once per non-empty block-row.
Two scalar-prefetched arrays drive the data-dependent windows:

* ``browf`` — block-row of each flat block (monotone non-decreasing; the
  out BlockSpec index_map reads it, so the window flushes exactly at row
  boundaries);
* ``bcol`` — block-column of each flat block, indexing the 128-row x window
  the block multiplies.

Per step: one (128,128)@(128,F) MXU matmul accumulated into the resident
f32 output window — no gathers, no scatters anywhere.  A flat grid (rather
than the earlier ``(block_row, max_blocks_per_row)`` rectangle) makes the
step count equal to the stored-block count even when the block-per-row
distribution is skewed — on degree-sorted power-law graphs the densest
block-row holds 100x the median and a rectangular grid would DMA clamped
blocks for every wasted step (measured 20x slowdown on a Zipf-1.5 graph).

Empty block-rows are never visited, so the builder (``ops/bsr.py``)
guarantees every block-row holds at least one (possibly all-zero) block.

See ``ops/bsr.py`` for the design rationale and the reference hot path this
replaces (``torch_geometric/nn/conv/message_passing.py:124-300``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

try:  # pallas is TPU/Mosaic-only; import lazily for CPU test environments
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

BLOCK = 128


def bsr_available() -> bool:
    if not _PALLAS_OK:
        return False
    return jax.default_backend() in ("tpu", "axon")


def _kernel(browf_ref, bcol_ref, blk_ref, x_ref, out_ref):
    k = pl.program_id(0)
    # new block-row starts here: reset the resident accumulator window
    prev = browf_ref[jnp.maximum(k - 1, 0)]
    first_of_row = jnp.logical_or(k == 0, prev != browf_ref[k])

    @pl.when(first_of_row)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # bf16 blocks (plan block_dtype): cast the x window to match so the
    # MXU runs native bf16 x bf16 -> f32; accumulation stays f32
    xw = x_ref[...]
    if blk_ref.dtype == jnp.bfloat16:
        xw = xw.astype(jnp.bfloat16)
    out_ref[...] += jax.lax.dot_general(
        blk_ref[0],
        xw,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel_uniform2(b0_ref, b1_ref, blk_ref, x0_ref, x1_ref, out_ref):
    """One step per OUTPUT row, both of its blocks in the step — no
    revisited windows, no zero-init, half the grid steps.  The flat
    kernel's per-step pipeline overhead is the banded case's bottleneck
    (measured 1.055 → 0.815 ms on the N=131k/E=4.2M bench graph)."""
    acc = jax.lax.dot_general(
        blk_ref[0, 0], x0_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc += jax.lax.dot_general(
        blk_ref[0, 1], x1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[...] = acc


def bsr_matmul_uniform2_pallas(m, x: jnp.ndarray, *,
                               interpret: bool = False) -> jnp.ndarray:
    """Paired-step matmul for matrices with EXACTLY two blocks per block
    row (``m.uniform_j == 2`` — the banded/RCM domain shape).  Blocks are
    cast to x's compute path like the flat kernel; bf16 blocks keep the
    f32 accumulate."""
    f = x.shape[1]
    nbrow = m.nbrow
    bc = m.block_cols
    nbcol = max(-(-m.num_cols // bc), 1)
    xp = x
    pad = nbcol * bc - x.shape[0]
    if pad > 0:
        xp = jnp.pad(x, ((0, pad), (0, 0)))
    if m.blocks.dtype == jnp.bfloat16:
        xp = xp.astype(jnp.bfloat16)
    bcol2 = m.bcol.reshape(nbrow, 2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nbrow,),
        in_specs=[
            pl.BlockSpec((1, 2, BLOCK, bc), lambda k, b0, b1: (k, 0, 0, 0)),
            pl.BlockSpec((bc, f), lambda k, b0, b1: (b0[k], 0)),
            pl.BlockSpec((bc, f), lambda k, b0, b1: (b1[k], 0)),
        ],
        out_specs=pl.BlockSpec((BLOCK, f), lambda k, b0, b1: (k, 0)),
    )
    out = pl.pallas_call(
        _kernel_uniform2,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbrow * BLOCK, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(bcol2[:, 0], bcol2[:, 1],
      m.blocks.reshape(nbrow, 2, BLOCK, bc), xp, xp)
    return out[: m.num_rows].astype(x.dtype)


def bsr_matmul_pallas(m, x: jnp.ndarray, *, interpret: bool = False) -> jnp.ndarray:
    """``out = A @ x`` over a :class:`~..bsr.BsrMatrix`; x is ``[num_cols, F]``.

    Requires every block-row to be non-empty (``bsr_from_coo`` pads empty
    rows with a zero block so untouched output windows cannot hold garbage).
    """
    f = x.shape[1]
    nbrow = m.nbrow
    nnzb = m.blocks.shape[0]
    bc = m.block_cols
    nbcol = max(-(-m.num_cols // bc), 1)

    xp = x
    pad = nbcol * bc - x.shape[0]
    if pad > 0:
        xp = jnp.pad(x, ((0, pad), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nnzb,),
        in_specs=[
            pl.BlockSpec((1, BLOCK, bc), lambda k, browf, bcol: (k, 0, 0)),
            pl.BlockSpec((bc, f), lambda k, browf, bcol: (bcol[k], 0)),
        ],
        out_specs=pl.BlockSpec((BLOCK, f), lambda k, browf, bcol: (browf[k], 0)),
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbrow * BLOCK, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(m.browf, m.bcol, m.blocks, xp)
    return out[: m.num_rows].astype(x.dtype)


def _kernel_fused(browf_ref, bcol_ref, alpha_ref, blk_ref, x_ref, out_ref, ss_ref):
    """SpMM step with a fused input scale + sum-of-squares epilogue.

    ``out = alpha * (A @ x)`` and ``ss[brow, :] = sum_r out[brow*128+r, :]^2``
    written once per block-row at its last visit — the chained-GNN-layer
    normalization pattern (``y * rsqrt(mean(y^2)+eps)`` feeding the next
    SpMM) then costs ZERO extra HBM passes: the scale rides the MXU
    accumulate (``A @ (alpha x) == alpha (A @ x)``) and the reduction reads
    the output window while it is still resident in VMEM.
    """
    k = pl.program_id(0)
    nk = pl.num_programs(0)
    prev = browf_ref[jnp.maximum(k - 1, 0)]
    first_of_row = jnp.logical_or(k == 0, prev != browf_ref[k])

    @pl.when(first_of_row)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    xw = x_ref[...]
    if blk_ref.dtype == jnp.bfloat16:
        xw = xw.astype(jnp.bfloat16)
    out_ref[...] += alpha_ref[0, 0] * jax.lax.dot_general(
        blk_ref[0],
        xw,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    nxt = browf_ref[jnp.minimum(k + 1, nk - 1)]
    last_of_row = jnp.logical_or(k == nk - 1, nxt != browf_ref[k])

    @pl.when(last_of_row)
    def _():
        o = out_ref[...]
        s = jnp.sum(o * o, axis=0)
        # ss tile is (1, 8, F) — 8 sublanes of padding so the output block
        # satisfies the TPU (8, 128) tiling rule; the partial lives in
        # sublane 0, the rest are zeros the caller never reads.  Built with
        # an iota mask: .at[].set lowers to scatter, which Mosaic lacks.
        sub = jax.lax.broadcasted_iota(jnp.int32, ss_ref.shape, 1)
        ss_ref[...] = jnp.where(sub == 0, s[None, None, :], 0.0)


def bsr_matmul_fused_pallas(
    m, x: jnp.ndarray, alpha, *, interpret: bool = False
):
    """``(alpha * (A @ x), per-block-row sum-of-squares partials)``.

    Returns ``(out[:num_rows], ss)`` with ``ss`` of shape ``[nbrow, F]``;
    ``ss.sum() == sum(out**2)`` exactly (rows past ``num_rows`` receive no
    edges, so they are zero and contribute nothing). Forward-only — the
    chained-inference / benchmark fast path."""
    f = x.shape[1]
    nbrow = m.nbrow
    nnzb = m.blocks.shape[0]
    bc = m.block_cols
    nbcol = max(-(-m.num_cols // bc), 1)

    xp = x
    pad = nbcol * bc - x.shape[0]
    if pad > 0:
        xp = jnp.pad(x, ((0, pad), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nnzb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # alpha, shape (1, 1)
            pl.BlockSpec((1, BLOCK, bc), lambda k, browf, bcol: (k, 0, 0)),
            pl.BlockSpec((bc, f), lambda k, browf, bcol: (bcol[k], 0)),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK, f), lambda k, browf, bcol: (browf[k], 0)),
            pl.BlockSpec((1, 8, f), lambda k, browf, bcol: (browf[k], 0, 0)),
        ],
    )
    out, ss = pl.pallas_call(
        _kernel_fused,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nbrow * BLOCK, f), jnp.float32),
            jax.ShapeDtypeStruct((nbrow, 8, f), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        m.browf,
        m.bcol,
        jnp.asarray(alpha, jnp.float32).reshape(1, 1),
        m.blocks,
        xp,
    )
    return out[: m.num_rows].astype(x.dtype), jnp.sum(ss)
