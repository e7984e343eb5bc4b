"""SDDMM — sampled dense-dense matrix multiplication.

``score[e] = <q[recv(e)], k[send(e)]>`` for every edge — the attention-logit
op (GAT/Transformer layers), the reference's torch-sparse role.

TPU note: SDDMM is two random row gathers + an elementwise dot.  XLA's TPU
row gather was measured at the chip's random-access bandwidth limit
(~210 GB/s on v5e; see ``ops/ell.py``), and the dot fuses into the gathers —
so a handwritten kernel cannot beat this formulation; Pallas effort goes to
the reduction side instead (``ops/pallas/segment.py``).  The fused
``attention_coefficients`` below composes SDDMM with the masked segment
softmax so the whole logit→alpha path stays on-chip.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .segment import segment_softmax


def sddmm(
    q: jnp.ndarray,
    k: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    *,
    edge_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """[E] (or [E, H] for multi-head inputs [N, H, F]) edge scores."""
    scores = jnp.sum(q[receivers] * k[senders], axis=-1)
    if scale is not None:
        scores = scores * scale
    if edge_mask is not None:
        scores = jnp.where(
            edge_mask.reshape(edge_mask.shape + (1,) * (scores.ndim - 1)),
            scores, 0,
        )
    return scores


def attention_coefficients(
    q: jnp.ndarray,
    k: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    num_nodes: int,
    *,
    edge_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """SDDMM + per-receiver masked softmax: the α_e of dot-product graph
    attention in one fused expression."""
    scores = jnp.sum(q[receivers] * k[senders], axis=-1)
    if scale is not None:
        scores = scores * scale
    return segment_softmax(scores, receivers, num_nodes, mask=edge_mask)
