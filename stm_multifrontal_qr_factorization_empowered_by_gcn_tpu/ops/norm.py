"""GCN symmetric normalization — reference ``nn/conv/gcn_conv.py:30-65``.

TPU-first twist: the reference materializes self-loop edges
(``add_remaining_self_loops``) which would change the static edge count here.
Instead we return the self-loop contribution analytically: for
Â = D̂^{-1/2}(A + c·I)D̂^{-1/2} with D̂ = D + c·I,

    (Â X)_i = Σ_e norm_e · X_{send(e)}  +  self_norm_i · X_i

so no edge materialization, no shape change, and the diagonal term fuses into
the dense path (pure VPU work).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from .. import _axis_context as _pctx
from .segment import segment_sum


def gcn_norm(
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    num_nodes: int,
    *,
    edge_weight: Optional[jnp.ndarray] = None,
    edge_mask: Optional[jnp.ndarray] = None,
    add_self_loops: bool = True,
    improved: bool = False,
    flow_src_to_dst: bool = True,
    indices_are_sorted: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Return ``(edge_norm, self_norm)``.

    ``edge_norm[e] = d^{-1/2}_{send(e)} · w_e · d^{-1/2}_{recv(e)}`` and
    ``self_norm[i] = c · d^{-1}_i`` (``None`` when ``add_self_loops=False``),
    where ``c = 2`` if ``improved`` else ``1`` (reference ``gcn_conv.py:36``).

    Degrees are accumulated at the aggregation side (receivers for the default
    source→target flow), matching ``gcn_norm``'s ``scatter_add(edge_weight,
    col)`` (reference ``gcn_conv.py:47-49``); for undirected inputs — the only
    sound GCN setting — both conventions coincide.
    """
    fill = 2.0 if improved else 1.0
    if edge_weight is None:
        edge_weight = jnp.ones(senders.shape[0], dtype=jnp.float32)
    if edge_mask is not None:
        edge_weight = jnp.where(edge_mask, edge_weight, 0)

    deg_index = receivers if flow_src_to_dst else senders
    deg = _pctx.cross_shard_sum(
        segment_sum(
            edge_weight, deg_index, num_nodes,
            indices_are_sorted=indices_are_sorted,
        )
    )
    if add_self_loops:
        deg = deg + fill
    deg_inv_sqrt = jnp.where(deg > 0, jnp.power(jnp.maximum(deg, 1e-12), -0.5), 0.0)
    edge_norm = deg_inv_sqrt[senders] * edge_weight * deg_inv_sqrt[receivers]
    self_norm = fill * deg_inv_sqrt * deg_inv_sqrt if add_self_loops else None
    return edge_norm, self_norm
