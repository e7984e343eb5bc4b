"""ASAPooling — reference ``torch_geometric/nn/pool/asap.py`` (ASAP:
Adaptive Structure Aware Pooling, Ranjan et al. 2020).

Reference math (kept exactly):

1. every node ``c`` forms a *cluster* over its in-neighborhood ∪ {self};
   its query is ``lin(max_j x_pool_j)``;
2. membership attention ``score(j→c) = softmax_c(LeakyReLU(att([q_c‖x_j])))``;
3. cluster feature ``x'_c = Σ_j score(j→c)·x_j``;
4. cluster fitness via LEConv, top-``⌈ratio·N⌉`` clusters survive,
   features gated by fitness;
5. coarsened adjacency ``A' = SᵀAS`` restricted to the survivors
   (``S[j,c] = score(j→c)``).

TPU-native redesign: the reference computes step 5 with chained
``torch_sparse`` SpSpMM kernels whose output sparsity is data-dependent — a
shape XLA cannot compile.  Here steps 1–3 run in edge space with masked
segment ops (self loops handled *analytically*, never materialized — the
static edge budget stays untouched), and step 5 is a **dense-window batched
matmul**: ``A`` and ``S`` are scattered into ``[B, N_max, N_max]`` windows
and ``SᵀAS`` becomes two MXU batched matmuls.  ASAP's use-case is
graph-classification-scale inputs (TU datasets; the reference's own
``benchmark/kernel/asap.py``), where ``N_max`` is a few hundred — exactly
the regime where dense MXU work beats sparse bookkeeping on TPU.  The
pooled graph keeps static ``(out_nodes, out_edges)`` budgets with validity
counts, like every pooling op in this framework (see ``topk_pool.py``).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.graph import Graph
from ...ops.segment import segment_max, segment_sum
from ...utils.random_graphs import to_dense_adj
from ..inits import kaiming_uniform, linear_bias


class ASAPOutput(NamedTuple):
    graph: Graph            # pooled graph (edges carry the SᵀAS weights)
    perm: jnp.ndarray       # [out_nodes] original index of each kept cluster
    fitness: jnp.ndarray    # [out_nodes] fitness of kept clusters


class ASAPooling(nn.Module):
    in_channels: int
    ratio: float = 0.5
    dropout: float = 0.0
    negative_slope: float = 0.2
    add_self_loops: bool = False
    out_nodes: Optional[int] = None
    out_edges: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        g: Graph,
        x: Optional[jnp.ndarray] = None,
        *,
        edge_weight: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> ASAPOutput:
        x = g.nodes if x is None else x
        n_pad, e_pad = g.num_nodes, g.num_edges
        out_nodes = n_pad if self.out_nodes is None else self.out_nodes
        out_edges = e_pad if self.out_edges is None else self.out_edges
        senders, receivers = g.senders, g.receivers
        node_mask, edge_mask = g.node_mask(), g.edge_mask()
        w_e = jnp.ones(e_pad, x.dtype) if edge_weight is None else edge_weight
        w_e = jnp.where(edge_mask, w_e, 0)
        c = self.in_channels

        # -- 1. cluster query: max over in-neighborhood ∪ {self} ------------
        x_pool = x
        neg = jnp.array(-jnp.inf, x.dtype)
        gathered = jnp.where(edge_mask[:, None], x_pool[senders], neg)
        x_q = segment_max(gathered, receivers, n_pad)
        x_q = jnp.maximum(x_q, x_pool)                    # analytic self loop
        x_q = x_q @ self.param("lin", kaiming_uniform(), (c, c)) + self.param(
            "lin_bias", linear_bias(c), (c,)
        )

        # -- 2. membership attention over {in-edges} ∪ {self} ---------------
        att_w = self.param("att", kaiming_uniform(), (2 * c, 1))
        att_b = self.param("att_bias", linear_bias(2 * c), (1,))

        def raw(qc, xj):
            return (jnp.concatenate([qc, xj], axis=-1) @ att_w + att_b)[..., 0]

        s_edge = jax.nn.leaky_relu(
            raw(x_q[receivers], x_pool[senders]), self.negative_slope
        )
        s_self = jax.nn.leaky_relu(raw(x_q, x_pool), self.negative_slope)
        s_edge = jnp.where(edge_mask, s_edge, neg)
        m = jnp.maximum(segment_max(s_edge, receivers, n_pad), s_self)
        m = jnp.where(jnp.isneginf(m), 0, m)
        ex_e = jnp.where(edge_mask, jnp.exp(s_edge - m[receivers]), 0)
        ex_s = jnp.exp(s_self - m)
        denom = segment_sum(ex_e, receivers, n_pad) + ex_s
        denom = jnp.maximum(denom, 1e-16)
        score_e = ex_e / denom[receivers]
        score_s = ex_s / denom
        if self.dropout > 0:
            score_e = nn.Dropout(self.dropout, deterministic=not train)(score_e)
            score_s = nn.Dropout(self.dropout, deterministic=not train)(score_s)

        # -- 3. cluster features --------------------------------------------
        x_new = (
            segment_sum(x[senders] * score_e[:, None], receivers, n_pad)
            + x * score_s[:, None]
        )

        # -- 4. fitness (inline LEConv, self loop analytic) ------------------
        w1 = self.param("score_lin1", kaiming_uniform(), (c, 1))
        w2 = self.param("score_lin2", kaiming_uniform(), (c, 1))
        w3 = self.param("score_lin3", kaiming_uniform(), (c, 1))
        sb = self.param("score_bias", linear_bias(c), (1,))
        a2, a3 = x_new @ w2, x_new @ w3
        diff = jnp.where(
            edge_mask[:, None], w_e[:, None] * (a2[receivers] - a3[senders]), 0
        )
        fit = (
            x_new @ w1
            + segment_sum(diff, receivers, n_pad)
            + (a2 - a3)                                   # self loop, weight 1
            + sb
        )[:, 0]
        fitness = jax.nn.sigmoid(fit)

        # -- top-k cluster selection (lexsort pattern of topk_pool) ----------
        ids = g.node_graph_ids()
        masked_fit = jnp.where(node_mask, fitness, neg)
        order = jnp.lexsort((-masked_fit, ids))
        starts = (jnp.cumsum(g.n_node) - g.n_node)[ids[order]]
        pos = jnp.arange(n_pad) - starts
        k = jnp.ceil(self.ratio * g.n_node.astype(jnp.float32)).astype(jnp.int32)
        kept = (pos < k[ids[order]]) & node_mask[order]
        compact = jnp.argsort(~kept, stable=True)
        perm = jnp.where(kept[compact], order[compact], n_pad - 1)[:out_nodes]
        kept_out = kept[compact][:out_nodes]
        x_out = jnp.where(
            kept_out[:, None], x_new[perm] * fitness[perm][:, None], 0
        )
        n_node_new = jnp.minimum(k, g.n_node)

        # -- 5. A' = SᵀAS as dense-window batched MXU matmuls ----------------
        # A_rs[g, r, s] = w(s→r); S_cj[g, c, j] = score(j→c); then the
        # reference's A'[c, d] (edge c→d of the pooled graph) equals
        # (S · A_pygᵀ·… ) = einsum('bci,bij,bdj', S, Aᵀ_rs, S).
        b = g.num_graphs
        n_win = int(n_pad)  # static window; ASAP targets small-graph batches
        offsets = jnp.cumsum(g.n_node) - g.n_node
        loc = jnp.arange(n_pad) - offsets[ids]
        dense_kw = dict(
            num_graphs=b, max_num_nodes=n_win,
            node_offsets=offsets, edge_mask=edge_mask,
        )
        A_rs = to_dense_adj(senders, receivers, ids, edge_weight=w_e, **dense_kw)
        S_cj = to_dense_adj(
            senders, receivers, ids, edge_weight=score_e, **dense_kw
        )
        S_cj = S_cj.at[ids, loc, loc].add(jnp.where(node_mask, score_s, 0))
        A_pyg = jnp.swapaxes(A_rs, 1, 2)                  # [g, i, j] = w(i→j)
        A_new = jnp.einsum("bci,bij->bcj", S_cj, A_pyg)
        A_new = jnp.einsum("bcj,bdj->bcd", A_new, S_cj)

        # gather kept-cluster submatrix back to a static edge list
        perm_graph = ids[perm]
        perm_loc = loc[perm]
        slots = jnp.arange(out_nodes)
        same_g = (perm_graph[:, None] == perm_graph[None, :]) & (
            kept_out[:, None] & kept_out[None, :]
        )
        wvals = A_new[perm_graph[:, None], perm_loc[:, None], perm_loc[None, :]]
        diag = jnp.eye(out_nodes, dtype=bool)
        wvals = jnp.where(diag, 1.0 if self.add_self_loops else 0.0, wvals)
        cand_mask = same_g & (jnp.abs(wvals) > 1e-12)
        flat_mask = cand_mask.reshape(-1)
        flat_w = wvals.reshape(-1)
        flat_s = jnp.repeat(slots, out_nodes)
        flat_r = jnp.tile(slots, out_nodes)
        # order candidates graph-major so n_edge counts stay contiguous
        cand_g = jnp.where(flat_mask, perm_graph[flat_s], b - 1)
        e_order = jnp.lexsort((~flat_mask, cand_g))[:out_edges]
        ek = flat_mask[e_order]
        senders_new = jnp.where(ek, flat_s[e_order], out_nodes - 1)
        receivers_new = jnp.where(ek, flat_r[e_order], out_nodes - 1)
        ew_new = jnp.where(ek, flat_w[e_order], 0)
        n_edge_new = segment_sum(
            ek.astype(jnp.int32), jnp.where(ek, cand_g[e_order], b - 1), b
        )

        pooled = Graph(
            nodes=x_out,
            senders=senders_new,
            receivers=receivers_new,
            n_node=n_node_new,
            n_edge=n_edge_new,
            edges=ew_new[:, None],
            globals=g.globals,
            y=g.y,
        )
        return ASAPOutput(pooled, perm, jnp.where(kept_out, fitness[perm], 0))
