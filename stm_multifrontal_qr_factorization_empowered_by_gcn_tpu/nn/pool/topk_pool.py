"""TopKPooling — reference ``torch_geometric/nn/pool/topk_pool.py:11-175``.

Reference semantics: score ``y = X·p/‖p‖``, keep the top ``⌈ratio·N_g⌉`` nodes
of every graph, multiply surviving features by ``tanh(y)``, and relabel the
surviving edges (``topk`` at ``:11-53``, ``filter_adj`` at ``:56-71``).

TPU-native design: the reference's per-graph dynamic ``k`` cannot change
tensor shapes under XLA, so the pooled graph keeps a *static* node/edge budget
(``out_nodes``/``out_edges``, default = input budgets) and moves validity into
``n_node``/``n_edge`` counts.  Selection is one global lexsort by
``(graph_id, -score)`` + a stable compaction argsort — O(N log N) VPU work,
no host round-trips, fully differentiable through the gathered features.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax.numpy as jnp

from ...data.graph import Graph
from ...ops.segment import segment_sum
from ..inits import uniform


class TopKOutput(NamedTuple):
    graph: Graph          # pooled graph (same static budgets unless overridden)
    perm: jnp.ndarray     # [out_nodes] original index of each kept node (pad: N-1)
    score: jnp.ndarray    # [out_nodes] gating scores of kept nodes


def topk_pool(
    g: Graph,
    score: jnp.ndarray,
    ratio: float,
    *,
    out_nodes: Optional[int] = None,
    out_edges: Optional[int] = None,
    multiplier_fn=jnp.tanh,
) -> TopKOutput:
    """Static-budget per-graph top-k node selection over padded scores; returns the keep mask/indices (the reference's dynamic ``topk`` at ``nn/pool/topk_pool.py:11-53`` restated with fixed shapes for jit)."""
    n_pad = g.num_nodes
    e_pad = g.num_edges
    out_nodes = n_pad if out_nodes is None else out_nodes
    out_edges = e_pad if out_edges is None else out_edges

    ids = g.node_graph_ids()
    node_mask = g.node_mask()
    neg_inf = jnp.array(-jnp.inf, score.dtype)
    masked_score = jnp.where(node_mask, score, neg_inf)

    # --- per-graph top-k selection via one global lexsort ----------------
    order = jnp.lexsort((-masked_score, ids))          # graph-major, score desc
    sorted_ids = ids[order]
    starts = (jnp.cumsum(g.n_node) - g.n_node)[sorted_ids]
    pos_in_graph = jnp.arange(n_pad) - starts
    k = jnp.ceil(ratio * g.n_node.astype(jnp.float32)).astype(jnp.int32)
    kept = (pos_in_graph < k[sorted_ids]) & node_mask[order]

    # --- stable compaction: kept nodes to the front -----------------------
    compact = jnp.argsort(~kept, stable=True)
    perm_full = order[compact]                          # original node index
    kept_sorted = kept[compact]
    perm = jnp.where(kept_sorted, perm_full, n_pad - 1)[:out_nodes]
    kept_out = kept_sorted[:out_nodes]

    new_x = g.nodes[perm]
    new_score = jnp.where(kept_out, score[perm], 0)
    gated = new_x * multiplier_fn(new_score)[:, None]
    gated = jnp.where(kept_out[:, None], gated, 0)

    n_node_new = jnp.minimum(k, g.n_node)               # = k for valid graphs

    # --- edge filtering + relabeling --------------------------------------
    # new_id[old] = compacted position (or -1 if dropped)
    new_id = jnp.full((n_pad,), -1, jnp.int32)
    new_id = new_id.at[perm].set(
        jnp.where(kept_out, jnp.arange(out_nodes, dtype=jnp.int32), -1), mode="drop"
    )
    e_mask = g.edge_mask()
    s_new, r_new = new_id[g.senders], new_id[g.receivers]
    edge_kept = (s_new >= 0) & (r_new >= 0) & e_mask
    e_ids = g.edge_graph_ids()
    n_edge_new = segment_sum(
        edge_kept.astype(jnp.int32), e_ids, g.num_graphs, indices_are_sorted=True
    )
    e_compact = jnp.argsort(~edge_kept, stable=True)[:out_edges]
    ek = edge_kept[e_compact]
    sentinel = jnp.int32(out_nodes - 1)
    senders = jnp.where(ek, s_new[e_compact], sentinel)
    receivers = jnp.where(ek, r_new[e_compact], sentinel)
    edges = None
    if g.edges is not None:
        edges = jnp.where(ek[:, None], g.edges[e_compact], 0)

    pooled = Graph(
        nodes=gated,
        senders=senders,
        receivers=receivers,
        n_node=n_node_new,
        n_edge=n_edge_new,
        edges=edges,
        globals=g.globals,
        y=g.y,
    )
    return TopKOutput(pooled, perm, new_score)


class TopKPooling(nn.Module):
    """Module form with the learnable projection vector ``p``
    (reference ``topk_pool.py:74-175``)."""

    in_channels: int
    ratio: float = 0.5
    out_nodes: Optional[int] = None
    out_edges: Optional[int] = None

    @nn.compact
    def __call__(self, g: Graph, x: Optional[jnp.ndarray] = None) -> TopKOutput:
        x = g.nodes if x is None else x
        p = self.param("weight", uniform(self.in_channels), (self.in_channels,))
        score = x @ p / jnp.maximum(jnp.linalg.norm(p), 1e-12)
        return topk_pool(
            g.replace(nodes=x),
            score,
            self.ratio,
            out_nodes=self.out_nodes,
            out_edges=self.out_edges,
        )
