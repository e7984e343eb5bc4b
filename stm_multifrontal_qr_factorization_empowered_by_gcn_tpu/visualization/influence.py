"""Node-influence maps — reference ``torch_geometric/visualization/
influence.py:5-15`` (Jacobian sensitivity of each node's output to every
node's input, row-normalized).

The reference loops ``autograd.grad`` per node; here ONE ``jacrev`` gives
the full [N, N, F_out→summed, F_in→abs-summed] tensor — a batched jacobian
the TPU evaluates in a single jitted program."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def influence(apply_fn, x, *args, **kwargs) -> jnp.ndarray:
    """[N, N] influence matrix: row j = how much each input node shaped
    node j's summed output, normalized to sum 1 per row.

    ``apply_fn(x, *args, **kwargs)`` must return per-node features [N, F].
    """

    def scalar_out(xi):
        return apply_fn(xi, *args, **kwargs).sum(axis=-1)  # [N]

    jac = jax.jacrev(scalar_out)(x)            # [N_out, N_in, F_in]
    infl = jnp.abs(jac).sum(axis=-1)           # [N_out, N_in]
    return infl / jnp.maximum(infl.sum(axis=1, keepdims=True), 1e-30)
