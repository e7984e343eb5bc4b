"""Pallas TPU kernel: BSR SpMM on the MXU.

Grid = (block_row, j) with j < max_blocks_per_row; the output 128-row window
is revisited across consecutive j steps so it stays resident in VMEM and is
written to HBM once per block-row.  The data-dependent block positions come
from two scalar-prefetched arrays used inside BlockSpec index_maps:

* ``ptr``  — block-row pointers; step (r, j) touches flat block ``ptr[r]+j``
  when that is < ``ptr[r+1]`` (else the compute is predicated off and the
  index_map clamps to a valid block);
* ``bcol`` — block-column per flat block, indexing the 128-row x window the
  j-th block of the row multiplies.

Per step: one (128,128)@(128,F) MXU matmul accumulated into the resident
f32 output window — no gathers, no scatters anywhere.  See ``ops/bsr.py``
for the design rationale and the reference hot-path this replaces
(``torch_geometric/nn/conv/message_passing.py:124-300``).
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


def _kernel(bcol_ref, ptr_ref, blk_ref, x_ref, out_ref):
    r = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(ptr_ref[r] + j < ptr_ref[r + 1])
    def _():
        out_ref[...] += jax.lax.dot_general(
            blk_ref[0],
            x_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def bsr_matmul_pallas(m, x: jnp.ndarray, *, interpret: bool = False) -> jnp.ndarray:
    """``out = A @ x`` over a :class:`~..bsr.BsrMatrix`; x is ``[num_cols, F]``."""
    f = x.shape[1]
    nbrow = m.nbrow
    nnzb = m.blocks.shape[0]
    maxj = m.max_blocks_per_row

    xp = x
    pad = nbrow * BLOCK - x.shape[0]
    if pad > 0:
        xp = jnp.pad(x, ((0, pad), (0, 0)))

    def _blk(r, j, bcol, ptr):
        return jnp.minimum(ptr[r] + j, nnzb - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nbrow, maxj),
        in_specs=[
            pl.BlockSpec((1, BLOCK, BLOCK), lambda r, j, bcol, ptr: (_blk(r, j, bcol, ptr), 0, 0)),
            pl.BlockSpec((BLOCK, f), lambda r, j, bcol, ptr: (bcol[_blk(r, j, bcol, ptr)], 0)),
        ],
        out_specs=pl.BlockSpec((BLOCK, f), lambda r, j, bcol, ptr: (r, 0)),
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbrow * BLOCK, f), jnp.float32),
        interpret=interpret,
    )(m.bcol, m.ptr, m.blocks, xp)
    return out[: m.num_rows].astype(x.dtype)
