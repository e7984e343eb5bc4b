"""Degree utilities (reference: ``torch_geometric/utils/degree.py``)."""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..ops.segment import segment_count


def degree(
    index: jnp.ndarray,
    num_nodes: int,
    *,
    mask: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Number of (valid) edges touching each node index."""
    return segment_count(index, num_nodes, mask=mask, dtype=dtype)
