"""Sparse (segment) softmax — reference ``torch_geometric/utils/softmax.py``."""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..ops.segment import segment_softmax


def softmax(
    src: jnp.ndarray,
    index: jnp.ndarray,
    num_nodes: int,
    *,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Softmax of ``src`` grouped by ``index`` (typically edge→receiver)."""
    return segment_softmax(src, index, num_nodes, mask=mask)
