"""EdgePooling — reference ``torch_geometric/nn/pool/edge_pool.py`` (Towards
Graph Pooling by Edge Contraction / Edge Contraction Pooling, Diehl 2019).

Reference behavior (kept exactly):

1. raw edge score ``e = lin([x_src ‖ x_dst])``; normalized by softmax over a
   node's incoming edges (or tanh / sigmoid); ``+ add_to_edge_score``;
2. edges contracted greedily in strictly descending score order, skipping
   edges incident to an already-contracted node (maximal matching);
3. cluster features = sum of member features × the contracting edge's score
   (kept singleton nodes score 1.0);
4. coarsened edges = relabeled originals, duplicates coalesced;
5. ``unpool`` divides by the stored score and gathers back by cluster.

TPU-native redesign: the reference's matching is a *host-side Python loop*
over edges in score order (``edge_pool.py:118-146``) — inherently sequential
and off-device.  Here it runs on device as **iterated locally-dominant-edge
selection** inside a ``lax.while_loop``: each round selects every edge that
is the best-ranked active edge of *both* its endpoints, which provably
yields the *same* matching as the sequential greedy scan (for distinct
priorities — ties are broken by edge index, matching a stable descending
sort).  Typical graphs converge in O(log E) rounds, each round a pair of
``segment_min``s.  All shapes are static; the pooled graph keeps
``(out_nodes, out_edges)`` budgets with validity counts like every pooling
op in this framework.

Deviation (documented): pooled node ordering is graph-major (this
framework's batching invariant) with clusters ordered by contraction
priority within each graph, whereas the reference numbers clusters globally
in choice order.  Contents are identical up to this permutation.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph
from ...ops.segment import segment_sum
from ..inits import kaiming_uniform, linear_bias

_BIG = jnp.iinfo(jnp.int32).max


class EdgePoolUnpool(NamedTuple):
    cluster: jnp.ndarray         # [N_pad] pooled-node id of each input node
    new_edge_score: jnp.ndarray  # [out_nodes] score each cluster was scaled by
    n_node: jnp.ndarray          # [G] original per-graph node counts


class EdgePoolOutput(NamedTuple):
    graph: Graph
    unpool_info: EdgePoolUnpool


def _dominant_matching(rank, senders, receivers, valid_edge, num_nodes):
    """Greedy maximal matching by ascending ``rank``; returns [E] bool chosen.

    Equivalent to the reference's sequential scan: an edge is chosen iff it
    has the minimum rank among active edges at both endpoints; selected
    endpoints deactivate their other edges; repeat to fixpoint.
    """

    def node_best(active_e):
        r = jnp.where(active_e, rank, _BIG)
        best = jnp.full(num_nodes, _BIG, rank.dtype)
        best = best.at[senders].min(r)
        best = best.at[receivers].min(r)
        return best

    def cond(state):
        _, active_n = state
        alive = valid_edge & active_n[senders] & active_n[receivers]
        return jnp.any(alive)

    def body(state):
        chosen, active_n = state
        alive = valid_edge & active_n[senders] & active_n[receivers]
        best = node_best(alive)
        dom = alive & (rank == best[senders]) & (rank == best[receivers])
        chosen = chosen | dom
        hit = jnp.zeros(num_nodes, bool)
        hit = hit.at[senders].max(dom)
        hit = hit.at[receivers].max(dom)
        return chosen, active_n & ~hit

    chosen0 = jnp.zeros_like(valid_edge)
    active0 = jnp.ones(num_nodes, bool)
    chosen, _ = jax.lax.while_loop(cond, body, (chosen0, active0))
    return chosen


class EdgePooling(nn.Module):
    in_channels: int
    edge_score_method: str = "softmax"   # softmax | tanh | sigmoid
    dropout: float = 0.0
    add_to_edge_score: float = 0.5
    out_nodes: Optional[int] = None
    out_edges: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        g: Graph,
        x: Optional[jnp.ndarray] = None,
        *,
        train: bool = False,
    ) -> EdgePoolOutput:
        x = g.nodes if x is None else x
        n_pad, e_pad = g.num_nodes, g.num_edges
        out_nodes = n_pad if self.out_nodes is None else self.out_nodes
        out_edges = e_pad if self.out_edges is None else self.out_edges
        senders, receivers = g.senders, g.receivers
        node_mask, edge_mask = g.node_mask(), g.edge_mask()
        ids = g.node_graph_ids()
        b = g.num_graphs
        c = self.in_channels

        # -- 1. edge scores ---------------------------------------------------
        w = self.param("lin", kaiming_uniform(), (2 * c, 1))
        bias = self.param("lin_bias", linear_bias(2 * c), (1,))
        raw = (
            jnp.concatenate([x[senders], x[receivers]], axis=-1) @ w + bias
        )[:, 0]
        if self.dropout > 0:
            raw = nn.Dropout(self.dropout, deterministic=not train)(raw)
        if self.edge_score_method == "softmax":
            m = jnp.where(edge_mask, raw, -jnp.inf)
            mx = jnp.full(n_pad, -jnp.inf).at[receivers].max(m)
            ex = jnp.where(edge_mask, jnp.exp(raw - mx[receivers]), 0)
            denom = jnp.maximum(segment_sum(ex, receivers, n_pad), 1e-16)
            score = ex / denom[receivers]
        elif self.edge_score_method == "tanh":
            score = jnp.tanh(raw)
        else:
            score = jax.nn.sigmoid(raw)
        score = score + self.add_to_edge_score

        # -- 2. greedy matching (descending score, index tiebreak) ------------
        order = jnp.lexsort((jnp.arange(e_pad), -jnp.where(edge_mask, score, -jnp.inf)))
        rank = jnp.zeros(e_pad, jnp.int32).at[order].set(jnp.arange(e_pad, dtype=jnp.int32))
        rank = jnp.where(edge_mask, rank, _BIG)
        chosen = _dominant_matching(rank, senders, receivers, edge_mask, n_pad)

        # -- 3. cluster ids, graph-major, priority-ordered ---------------------
        owner = jnp.full(n_pad, _BIG, jnp.int32)  # rank of covering edge
        owner = owner.at[jnp.where(chosen, senders, n_pad - 1)].min(
            jnp.where(chosen, rank, _BIG), mode="drop"
        )
        owner = owner.at[jnp.where(chosen, receivers, n_pad - 1)].min(
            jnp.where(chosen, rank, _BIG), mode="drop"
        )
        matched = owner < _BIG
        # per-node sort key: (graph, matched-edge rank | e_pad+node_idx)
        sub = jnp.where(matched, owner, e_pad + jnp.arange(n_pad))
        sub = jnp.where(node_mask, sub, _BIG)
        nsort = jnp.lexsort((sub, jnp.where(node_mask, ids, b - 1)))
        key_sorted = sub[nsort]
        gid_sorted = jnp.where(node_mask[nsort], ids[nsort], b - 1)
        new_cluster = jnp.concatenate(
            [
                jnp.ones((1,), bool),
                (key_sorted[1:] != key_sorted[:-1])
                | (gid_sorted[1:] != gid_sorted[:-1]),
            ]
        ) & node_mask[nsort]
        cid_sorted = jnp.cumsum(new_cluster.astype(jnp.int32)) - 1
        cid_sorted = jnp.where(node_mask[nsort], cid_sorted, out_nodes - 1)
        cluster = jnp.zeros(n_pad, jnp.int32).at[nsort].set(cid_sorted)
        num_valid_clusters = jnp.sum(new_cluster.astype(jnp.int32))
        n_node_new = segment_sum(
            new_cluster.astype(jnp.int32),
            jnp.where(new_cluster, gid_sorted, b - 1),
            b,
        )

        # -- 4. pooled features -------------------------------------------------
        xm = jnp.where(node_mask[:, None], x, 0)
        x_sum = segment_sum(xm, cluster, out_nodes)
        # cluster score: contracting edge's score, or 1.0 for singletons
        cl_rank = jnp.full(out_nodes, _BIG, jnp.int32).at[cluster].min(
            jnp.where(node_mask, sub, _BIG)
        )
        edge_rank_score = jnp.zeros(e_pad).at[rank].set(
            score, mode="drop"
        )  # score by rank id
        cl_from_edge = cl_rank < e_pad
        cl_score = jnp.where(
            cl_from_edge, edge_rank_score[jnp.clip(cl_rank, 0, e_pad - 1)], 1.0
        )
        cl_valid = jnp.arange(out_nodes) < num_valid_clusters
        cl_score = jnp.where(cl_valid, cl_score, 0.0)
        x_new = x_sum * cl_score[:, None]

        # -- 5. coarsened edges (relabel + coalesce, static budget) -----------
        es = jnp.where(edge_mask, cluster[senders], out_nodes - 1)
        er = jnp.where(edge_mask, cluster[receivers], out_nodes - 1)
        eorder = jnp.lexsort((er, es, ~edge_mask))  # valid first, (s, r) sorted
        ss, rr, vs = es[eorder], er[eorder], edge_mask[eorder]
        first = vs & jnp.concatenate(
            [jnp.ones((1,), bool), (ss[1:] != ss[:-1]) | (rr[1:] != rr[:-1])]
        )
        keep = jnp.lexsort((jnp.arange(e_pad), ~first))[:out_edges]
        kmask = first[keep]
        ks = jnp.where(kmask, ss[keep], out_nodes - 1)
        kr = jnp.where(kmask, rr[keep], out_nodes - 1)
        cl_gid = jnp.zeros(out_nodes, jnp.int32).at[cluster].set(
            jnp.where(node_mask, ids, b - 1).astype(jnp.int32)
        )
        n_edge_new = segment_sum(
            kmask.astype(jnp.int32), jnp.where(kmask, cl_gid[ks], b - 1), b
        )

        pooled = Graph(
            nodes=x_new,
            senders=ks,
            receivers=kr,
            n_node=n_node_new,
            n_edge=n_edge_new,
            edges=None,
            globals=g.globals,
            y=g.y,
        )
        info = EdgePoolUnpool(cluster=cluster, new_edge_score=cl_score, n_node=g.n_node)
        return EdgePoolOutput(pooled, info)

    @staticmethod
    def unpool(x: jnp.ndarray, info: EdgePoolUnpool) -> jnp.ndarray:
        """Reverse of ``__call__`` for the node features (reference
        ``EdgePooling.unpool``): divide by the stored score, gather back."""
        safe = jnp.where(info.new_edge_score > 0, info.new_edge_score, 1.0)
        return (x / safe[:, None])[info.cluster]
