"""Relational / attention conv family.

TPU-native re-designs of:

* :class:`DNAConv`        — ``torch_geometric/nn/conv/dna_conv.py:172-299``
  (grouped multi-head attention over the per-node layer history)
* :class:`HypergraphConv` — ``hypergraph_conv.py:11-143``
* :class:`SignedConv`     — ``signed_conv.py:11-136``
* :class:`FiLMConv`       — ``film_conv.py:14-143``
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.norm import gcn_norm
from ...ops.segment import aggregate, segment_softmax, segment_sum
from ..inits import glorot, kaiming_uniform, linear_bias, zeros
from ..message_passing import MessagePassing, propagate, resolve_graph_args


# ---------------------------------------------------------------------------
# DNAConv
# ---------------------------------------------------------------------------

def restricted_softmax(src: jnp.ndarray, axis: int = -1, margin: float = 0.0):
    """Softmax with an implicit extra zero logit (reference
    ``dna_conv.py:65-69``) — lets attention put mass on 'nothing'."""
    src_max = jnp.maximum(jnp.max(src, axis=axis, keepdims=True), 0.0)
    out = jnp.exp(src - src_max)
    return out / (jnp.sum(out, axis=axis, keepdims=True)
                  + jnp.exp(margin - src_max))


class _GroupedLinear(nn.Module):
    """Linear with channel groups (reference ``dna_conv.py:16-60``)."""

    in_channels: int
    out_channels: int
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        g = self.groups
        w = self.param(
            "weight", kaiming_uniform(),
            (g, self.in_channels // g, self.out_channels // g),
        )
        shape = x.shape
        x = x.reshape(*shape[:-1], g, self.in_channels // g)
        out = jnp.einsum("...gi,gio->...go", x, w)
        out = out.reshape(*shape[:-1], self.out_channels)
        if self.use_bias:
            out = out + self.param(
                "bias", linear_bias(self.in_channels), (self.out_channels,)
            )
        return out


class DNAConv(MessagePassing):
    """Dynamic neighborhood aggregation (just-jump-knowledge) conv —
    reference ``dna_conv.py:172-299``.

    ``x`` is the layer history ``[N, L, C]``; each edge attends from the
    receiver's *latest* representation (query) over the sender's full
    history (keys/values) with grouped multi-head attention, then messages
    are GCN-normalized and summed.
    """

    channels: int
    heads: int = 1
    groups: int = 1
    normalize: bool = True
    add_self_loops: bool = True

    @nn.compact
    def __call__(self, x, graph_or_senders, receivers=None, *,
                 edge_weight=None, num_nodes=None, edge_mask=None):
        if x.ndim != 3:
            raise ValueError("DNAConv expects [num_nodes, num_layers, channels]")
        x_pair, senders, receivers, num_nodes, edge_mask, _ = (
            resolve_graph_args(x, graph_or_senders, receivers, num_nodes, edge_mask)
        )
        C, H = self.channels, self.heads
        lin_q = _GroupedLinear(C, C, self.groups, name="lin_q")
        lin_k = _GroupedLinear(C, C, self.groups, name="lin_k")
        lin_v = _GroupedLinear(C, C, self.groups, name="lin_v")

        self_w = None
        if self.normalize:
            edge_weight, self_w = gcn_norm(
                senders, receivers, num_nodes,
                edge_weight=edge_weight, edge_mask=edge_mask,
                add_self_loops=self.add_self_loops,
            )

        def message_fn(x_j, x_i, e_attr, e_w):
            # query: receiver's last layer [E, 1, C]; keys/values: sender
            # history [E, L, C] (reference dna_conv.py:291-295)
            q = lin_q(x_i[:, -1:, :])
            k = lin_k(x_j)
            v = lin_v(x_j)
            d = C // H
            e = q.shape[0]

            def split(z):
                return z.reshape(e, -1, H, d).transpose(0, 2, 1, 3)

            qh, kh, vh = split(q), split(k), split(v)
            score = jnp.einsum("ehqd,ehkd->ehqk", qh, kh) / jnp.sqrt(d)
            score = restricted_softmax(score, axis=-1)
            out = jnp.einsum("ehqk,ehkd->ehqd", score, vh)
            out = out.transpose(0, 2, 1, 3).reshape(e, 1, C)[:, 0]
            return out if e_w is None else out * e_w[:, None]

        out = propagate(
            x_pair, senders, receivers, num_nodes,
            message_fn=message_fn, edge_weight=edge_weight,
            edge_mask=edge_mask, aggr="add",
        )
        if self_w is not None:
            # analytic self-loop: the i->i message is the node attending over
            # its own history, scaled by the gcn_norm self coefficient —
            # static-shape equivalent of appending N loop edges
            out = out + message_fn(x, x, None, self_w)
        return out


# ---------------------------------------------------------------------------
# HypergraphConv
# ---------------------------------------------------------------------------

class HypergraphConv(MessagePassing):
    """Hypergraph conv ``X' = D^-1 H W B H^T X Θ`` — reference
    ``hypergraph_conv.py:11-143``.

    ``hyperedge_index`` is the [2, nnz] incidence (node, hyperedge); the two
    propagate passes (node→hyperedge with ``B`` norm, hyperedge→node with
    ``D`` norm) become two masked segment aggregations.
    """

    in_channels: int
    out_channels: int
    use_attention: bool = False
    heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, hyperedge_index, *, hyperedge_weight=None,
                 num_edges: Optional[int] = None, incidence_mask=None):
        n = x.shape[0]
        node_idx, he_idx = hyperedge_index[0], hyperedge_index[1]
        if num_edges is None:
            num_edges = int(he_idx.max()) + 1 if he_idx.size else 0
        H = self.heads if self.use_attention else 1
        M = self.out_channels
        weight = self.param("weight", glorot(), (self.in_channels, H * M))
        x = x @ weight

        alpha = None
        if self.use_attention:
            xv = x.reshape(-1, H, M)
            x_i, x_j = xv[node_idx], xv[he_idx % n]  # reference indexes x by
            # hyperedge id too (hypergraph_conv.py:103) — valid only when
            # hyperedge ids < num_nodes, as in its docs example
            att = self.param("att", glorot(), (1, H, 2 * M))
            a = jnp.sum(jnp.concatenate([x_i, x_j], axis=-1) * att, axis=-1)
            a = nn.leaky_relu(a, self.negative_slope)
            alpha = segment_softmax(a, node_idx, n, mask=incidence_mask)

        ones = jnp.ones_like(node_idx, jnp.float32)
        mask_f = ones if incidence_mask is None else incidence_mask.astype(jnp.float32)
        if hyperedge_weight is None:
            D = segment_sum(mask_f, node_idx, n)
        else:
            D = segment_sum(hyperedge_weight[he_idx] * mask_f, node_idx, n)
        D = jnp.where(D > 0, 1.0 / jnp.maximum(D, 1e-12), 0.0)
        B = segment_sum(mask_f, he_idx, num_edges)
        B = jnp.where(B > 0, 1.0 / jnp.maximum(B, 1e-12), 0.0)
        if hyperedge_weight is not None:
            B = B * hyperedge_weight

        xv = x.reshape(-1, H, M)
        # pass 1: node -> hyperedge, scaled by B at the receiving hyperedge
        msg = xv[node_idx] if alpha is None else xv[node_idx] * alpha[:, :, None]
        he = aggregate("add", msg.reshape(msg.shape[0], -1), he_idx, num_edges,
                       mask=incidence_mask).reshape(num_edges, H, M)
        he = he * B[:, None, None]
        # pass 2: hyperedge -> node, scaled by D at the receiving node
        msg2 = he[he_idx] if alpha is None else he[he_idx] * alpha[:, :, None]
        out = aggregate("add", msg2.reshape(msg2.shape[0], -1), node_idx, n,
                        mask=incidence_mask).reshape(n, H, M)
        out = out * D[:, None, None]

        out = out.reshape(n, H * M) if self.concat else out.mean(axis=1)
        if self.use_bias:
            out = out + self.param(
                "bias", zeros(), (H * M if self.concat else M,)
            )
        return out


# ---------------------------------------------------------------------------
# SignedConv
# ---------------------------------------------------------------------------

class SignedConv(MessagePassing):
    """Signed GCN conv — reference ``signed_conv.py:11-136``: separate
    positive/negative aggregations with balance-theory crossing after the
    first layer."""

    in_channels: int
    out_channels: int
    first_aggr: bool
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, pos_edges, neg_edges, *,
                 num_nodes=None, pos_mask=None, neg_mask=None):
        x_pair = x if isinstance(x, tuple) else (x, x)
        if num_nodes is None:
            num_nodes = x_pair[1].shape[0]
        ps, pr = pos_edges
        ns, nr = neg_edges

        def mean_agg(feat, s, r, m):
            return propagate((feat, None), s, r, num_nodes,
                             edge_mask=m, aggr="mean")

        def dense(name, z, out):
            return nn.Dense(out, use_bias=self.use_bias, name=name)(z)

        if self.first_aggr:
            out_pos = mean_agg(x_pair[0], ps, pr, pos_mask)
            out_pos = dense("lin_pos_l", out_pos, self.out_channels)
            out_pos = out_pos + dense("lin_pos_r", x_pair[1], self.out_channels)
            out_neg = mean_agg(x_pair[0], ns, nr, neg_mask)
            out_neg = dense("lin_neg_l", out_neg, self.out_channels)
            out_neg = out_neg + dense("lin_neg_r", x_pair[1], self.out_channels)
            return jnp.concatenate([out_pos, out_neg], axis=-1)

        F_in = self.in_channels
        x_src_pos, x_src_neg = x_pair[0][..., :F_in], x_pair[0][..., F_in:]
        x_dst_pos, x_dst_neg = x_pair[1][..., :F_in], x_pair[1][..., F_in:]
        # balance theory: friend-of-friend / enemy-of-enemy crossing
        # (reference signed_conv.py:100-122)
        pos_part = jnp.concatenate([
            mean_agg(x_src_pos, ps, pr, pos_mask),
            mean_agg(x_src_neg, ns, nr, neg_mask),
            x_dst_pos,
        ], axis=-1)
        neg_part = jnp.concatenate([
            mean_agg(x_src_neg, ps, pr, pos_mask),
            mean_agg(x_src_pos, ns, nr, neg_mask),
            x_dst_neg,
        ], axis=-1)
        out_pos = dense("lin_pos_l", pos_part, self.out_channels)
        out_neg = dense("lin_neg_l", neg_part, self.out_channels)
        return jnp.concatenate([out_pos, out_neg], axis=-1)


# ---------------------------------------------------------------------------
# FiLMConv
# ---------------------------------------------------------------------------

class FiLMConv(MessagePassing):
    """Feature-wise linear modulation conv — reference ``film_conv.py:14-143``.

    ``x'_i = σ(γ_s ⊙ W_s x_i + β_s) + (1/|N(i)|) Σ_r Σ_{j∈N_r(i)}
    σ(γ_{r,i} ⊙ W_r x_j + β_{r,i})`` where (β, γ) come from the *receiver*'s
    features.  Multi-relation graphs pass ``edge_type``; relations are
    static-unrolled with edge masks (no dynamic partitioning under jit).
    """

    in_channels: Union[int, Tuple[int, int]]
    out_channels: int
    num_relations: int = 1
    act: Optional[Callable] = nn.relu
    aggr: str = "mean"

    @nn.compact
    def __call__(self, x, graph_or_senders, receivers=None, *,
                 edge_type=None, num_nodes=None, edge_mask=None):
        x_pair, senders, receivers, num_nodes, edge_mask, _ = (
            resolve_graph_args(x, graph_or_senders, receivers, num_nodes, edge_mask)
        )
        act = self.act if self.act is not None else (lambda z: z)
        M = self.out_channels

        bg = nn.Dense(2 * M, use_bias=False, name="film_skip")(x_pair[1])
        beta_s, gamma_s = bg[..., :M], bg[..., M:]
        out = act(
            gamma_s * nn.Dense(M, use_bias=False, name="lin_skip")(x_pair[1])
            + beta_s
        )

        for r in range(max(self.num_relations, 1)):
            bgr = nn.Dense(2 * M, name=f"film_{r}")(x_pair[1])
            beta, gamma = bgr[..., :M], bgr[..., M:]
            xr = nn.Dense(M, use_bias=False, name=f"lin_{r}")(x_pair[0])

            mask = edge_mask
            if edge_type is not None and self.num_relations > 1:
                rel = edge_type == r
                mask = rel if mask is None else (mask & rel)

            def message_fn(x_j, x_i, e_attr, e_w, beta=beta, gamma=gamma):
                return act(gamma[receivers] * x_j + beta[receivers])

            out = out + propagate(
                (xr, x_pair[1]), senders, receivers, num_nodes,
                message_fn=message_fn, edge_mask=mask, aggr=self.aggr,
            )
        return out
