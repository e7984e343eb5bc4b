"""Final conv batch — reference ``torch_geometric/nn/conv/``:

* :class:`CGConv`   — ``cg_conv.py:12-86``   (crystal graph, gated message)
* :class:`GENConv`  — ``gen_conv.py:70-192`` (DeeperGCN softmax/power aggr)
* :class:`MFConv`   — ``mf_conv.py:10-108``  (degree-specific weights)
* :class:`PPFConv`  — ``ppf_conv.py:20-121`` (point-pair features + max)
* :class:`RGCNConv` — ``rgcn_conv.py:27-233`` (relational, basis/block decomp)
* :class:`WLConv`   — ``wl_conv.py:8-74``    (Weisfeiler-Lehman refinement)

TPU notes: per-degree (MF) and per-relation (RGCN) dispatch is data-dependent
in the reference (``index_select``/``masked_edge_index`` loops); here MF
gathers a stacked weight tensor by clipped degree (one batched matmul) and
RGCN statically unrolls relations with edge-type masks (no dynamic shapes
under jit) or, with basis decomposition, composes relation weights first.
WLConv is hash-based host-side refinement (the reference wraps it in
``@torch.no_grad``) — kept as a NumPy op.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...data.graph import Graph
from ...ops.segment import segment_softmax, segment_sum
from ..inits import glorot
from ..message_passing import MessagePassing, propagate, resolve_graph_args


class CGConv(MessagePassing):
    """Crystal graph conv: gated message ``σ(lin_f(z))·softplus(lin_s(z))``
    with ``z = [x_i ‖ x_j ‖ e_ij]``, residual to the receiver."""

    channels: Union[int, Tuple[int, int]]
    dim: int = 0
    aggr: str = "add"
    batch_norm: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, graph_or_senders, receivers=None, *,
                 edge_attr=None, num_nodes=None, edge_mask=None,
                 train: bool = False):
        (x_src, x_dst), senders, receivers, num_nodes, edge_mask, g_attr = (
            resolve_graph_args(x, graph_or_senders, receivers, num_nodes, edge_mask)
        )
        edge_attr = g_attr if edge_attr is None else edge_attr
        ch = self.channels if isinstance(self.channels, tuple) else (
            self.channels, self.channels
        )
        z = [x_dst[receivers], x_src[senders]]
        if edge_attr is not None:
            e = jnp.asarray(edge_attr)
            z.append(e[:, None] if e.ndim == 1 else e)
        z = jnp.concatenate(z, axis=-1)
        msg = jax.nn.sigmoid(
            nn.Dense(ch[1], use_bias=self.use_bias, name="lin_f")(z)
        ) * jax.nn.softplus(
            nn.Dense(ch[1], use_bias=self.use_bias, name="lin_s")(z)
        )
        from ...ops.segment import aggregate

        out = aggregate(self.aggr, msg, receivers, num_nodes, mask=edge_mask)
        if self.batch_norm:
            out = nn.BatchNorm(use_running_average=not train, name="bn")(out)
        return out + x_dst


class GENConv(MessagePassing):
    """GENeralized conv (DeeperGCN): ``MLP(x_i + AGG(relu(x_j + e) + ε))``
    with softmax / softmax_sg / power-mean aggregation."""

    in_channels: int
    out_channels: int
    aggr: str = "softmax"
    t: float = 1.0
    learn_t: bool = False
    p: float = 1.0
    learn_p: bool = False
    msg_norm: bool = False
    learn_msg_scale: bool = False
    num_layers: int = 2
    eps: float = 1e-7

    @nn.compact
    def __call__(self, x, graph_or_senders, receivers=None, *,
                 edge_attr=None, num_nodes=None, edge_mask=None,
                 train: bool = False):
        (x_src, x_dst), senders, receivers, num_nodes, edge_mask, g_attr = (
            resolve_graph_args(x, graph_or_senders, receivers, num_nodes, edge_mask)
        )
        edge_attr = g_attr if edge_attr is None else edge_attr
        msg = x_src[senders]
        if edge_attr is not None:
            e = jnp.asarray(edge_attr)
            msg = msg + (e[:, None] if e.ndim == 1 else e)
        msg = jax.nn.relu(msg) + self.eps
        if edge_mask is not None:
            msg = jnp.where(edge_mask[:, None], msg, 0)

        if self.aggr in ("softmax", "softmax_sg"):
            t = (
                self.param("t", lambda _k: jnp.asarray([self.t]))[0]
                if self.learn_t and self.aggr == "softmax"
                else self.t
            )
            alpha = segment_softmax(
                msg * t, receivers, num_nodes, mask=edge_mask
            )
            if self.aggr == "softmax_sg":
                alpha = jax.lax.stop_gradient(alpha)
            out = segment_sum(msg * alpha, receivers, num_nodes, mask=edge_mask)
        elif self.aggr == "power":
            p = (
                self.param("p", lambda _k: jnp.asarray([self.p]))[0]
                if self.learn_p
                else self.p
            )
            clipped = jnp.clip(msg, 1e-7, 1e1)
            ones = jnp.ones(receivers.shape[0], msg.dtype)
            if edge_mask is not None:
                ones = jnp.where(edge_mask, ones, 0)
            cnt = jnp.maximum(
                jax.ops.segment_sum(ones, receivers, num_nodes), 1
            )
            mean = (
                segment_sum(clipped**p, receivers, num_nodes, mask=edge_mask)
                / cnt[:, None]
            )
            out = jnp.clip(mean, 1e-7, 1e1) ** (1.0 / p)
        else:
            raise ValueError(f"unsupported aggr {self.aggr!r}")

        if self.msg_norm:
            s = (
                self.param("msg_scale", nn.initializers.ones, (1,))
                if self.learn_msg_scale
                else 1.0
            )
            norm = out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12
            )
            out = norm * jnp.linalg.norm(x_dst, axis=-1, keepdims=True) * s
        out = out + x_dst
        # MLP [in, 2*in, ..., out] with LayerNorm (batch-norm role; mask-free)
        h = out
        dims = [self.in_channels * 2] * (self.num_layers - 1) + [self.out_channels]
        for i, d in enumerate(dims):
            h = nn.Dense(d, name=f"mlp_{i}")(h)
            if i < len(dims) - 1:
                h = nn.LayerNorm(name=f"mlp_norm_{i}")(h)
                h = jax.nn.relu(h)
        return h


class MFConv(MessagePassing):
    """Molecular-fingerprint conv: degree-specific transforms
    ``x'_i = W_l^{deg(i)} Σ_j x_j + W_r^{deg(i)} x_i`` — the reference loops
    over degrees with ``index_select``; here the stacked weight tensor is
    gathered by clipped degree (one batched matmul per node)."""

    in_channels: Union[int, Tuple[int, int]]
    out_channels: int
    max_degree: int = 10
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, graph_or_senders, receivers=None, *,
                 num_nodes=None, edge_mask=None):
        (x_src, x_dst), senders, receivers, num_nodes, edge_mask, _ = (
            resolve_graph_args(x, graph_or_senders, receivers, num_nodes, edge_mask)
        )
        ch = self.in_channels if isinstance(self.in_channels, tuple) else (
            self.in_channels, self.in_channels
        )
        d = self.max_degree + 1
        ones = jnp.ones(receivers.shape[0], jnp.float32)
        if edge_mask is not None:
            ones = jnp.where(edge_mask, ones, 0)
        deg = jnp.clip(
            jax.ops.segment_sum(ones, receivers, num_nodes).astype(jnp.int32),
            0, self.max_degree,
        )
        h = propagate((x_src, None), senders, receivers, num_nodes,
                      edge_mask=edge_mask, aggr="add")
        w_l = self.param("lins_l", glorot(), (d, ch[0], self.out_channels))
        b_l = self.param("lins_l_bias", nn.initializers.zeros,
                         (d, self.out_channels)) if self.use_bias else None
        w_r = self.param("lins_r", glorot(), (d, ch[1], self.out_channels))
        out = jnp.einsum("ni,nio->no", h, w_l[deg])
        if b_l is not None:
            out = out + b_l[deg]
        if x_dst is not None:
            out = out + jnp.einsum("ni,nio->no", x_dst, w_r[deg])
        return out


def point_pair_features(pos_i, pos_j, normal_i, normal_j):
    """Rotation-invariant (‖d‖, ∠(n_i,d), ∠(n_j,d), ∠(n_i,n_j)) per edge."""
    d = pos_j - pos_i

    def angle(a, b):
        cross = jnp.linalg.norm(jnp.cross(a, b), axis=-1)
        dot = jnp.sum(a * b, axis=-1)
        return jnp.arctan2(cross, dot)

    return jnp.stack(
        [
            jnp.linalg.norm(d, axis=-1),
            angle(normal_i, d),
            angle(normal_j, d),
            angle(normal_i, normal_j),
        ],
        axis=1,
    )


class PPFConv(MessagePassing):
    """PointNet-style conv over point-pair features with max aggregation and
    an analytic self loop (never materialized — static edge budget kept)."""

    local_nn: Optional[Callable] = None
    global_nn: Optional[Callable] = None
    add_self_loops: bool = True

    @nn.compact
    def __call__(self, x, pos, normal, graph_or_senders, receivers=None, *,
                 num_nodes=None, edge_mask=None):
        (x_src, x_dst), senders, receivers, num_nodes, edge_mask, _ = (
            resolve_graph_args(
                (x, x) if not isinstance(x, tuple) else x,
                graph_or_senders, receivers, num_nodes, edge_mask,
            )
        )
        pos_pair = pos if isinstance(pos, tuple) else (pos, pos)
        nrm_pair = normal if isinstance(normal, tuple) else (normal, normal)

        ppf = point_pair_features(
            pos_pair[1][receivers], pos_pair[0][senders],
            nrm_pair[1][receivers], nrm_pair[0][senders],
        )
        msg = ppf if x_src is None else jnp.concatenate(
            [x_src[senders], ppf], axis=1
        )
        local = self.local_nn if self.local_nn is not None else (lambda v: v)
        msg = local(msg)
        neg = jnp.asarray(-jnp.inf, msg.dtype)
        if edge_mask is not None:
            msg = jnp.where(edge_mask[:, None], msg, neg)
        out = jax.ops.segment_max(msg, receivers, num_nodes)
        if self.add_self_loops:
            # self loop: d = 0 → ppf = zeros
            self_ppf = jnp.zeros((num_nodes, 4), msg.dtype)
            self_msg = self_ppf if x_dst is None else jnp.concatenate(
                [x_dst, self_ppf], axis=1
            )
            out = jnp.maximum(out, local(self_msg))
        out = jnp.where(jnp.isneginf(out), 0, out)
        if self.global_nn is not None:
            out = self.global_nn(out)
        return out


class RGCNConv(MessagePassing):
    """Relational GCN with optional basis / block-diagonal decomposition.
    Relations are statically unrolled with edge-type masks."""

    in_channels: Union[int, Tuple[int, int]]
    out_channels: int
    num_relations: int
    num_bases: Optional[int] = None
    num_blocks: Optional[int] = None
    aggr: str = "mean"
    root_weight: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, graph_or_senders, receivers=None, *,
                 edge_type, num_nodes=None, edge_mask=None):
        if self.num_bases is not None and self.num_blocks is not None:
            raise ValueError("choose at most one of num_bases / num_blocks")
        (x_src, x_dst), senders, receivers, num_nodes, edge_mask, _ = (
            resolve_graph_args(x, graph_or_senders, receivers, num_nodes, edge_mask)
        )
        ch = self.in_channels if isinstance(self.in_channels, tuple) else (
            self.in_channels, self.in_channels
        )
        r_count, f_in, f_out = self.num_relations, ch[0], self.out_channels

        if self.num_bases is not None:
            basis = self.param("weight", glorot(), (self.num_bases, f_in, f_out))
            comp = self.param("comp", glorot(), (r_count, self.num_bases))
            weight = jnp.einsum("rb,bio->rio", comp, basis)
        elif self.num_blocks is not None:
            if f_in % self.num_blocks or f_out % self.num_blocks:
                raise ValueError("channels must divide num_blocks")
            weight = self.param(
                "weight", glorot(),
                (r_count, self.num_blocks, f_in // self.num_blocks,
                 f_out // self.num_blocks),
            )
        else:
            weight = self.param("weight", glorot(), (r_count, f_in, f_out))

        out = jnp.zeros((num_nodes, f_out), x_src.dtype)
        for rel in range(r_count):
            m = edge_type == rel
            if edge_mask is not None:
                m = m & edge_mask
            h = propagate((x_src, None), senders, receivers, num_nodes,
                          edge_mask=m, aggr=self.aggr)
            if self.num_blocks is not None:
                hb = h.reshape(num_nodes, self.num_blocks, -1)
                out = out + jnp.einsum(
                    "nbi,bio->nbo", hb, weight[rel]
                ).reshape(num_nodes, f_out)
            else:
                out = out + h @ weight[rel]
        if self.root_weight and x_dst is not None:
            root = self.param("root", glorot(), (ch[1], f_out))
            out = out + x_dst @ root
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (f_out,))
        return out


class WLConv:
    """Weisfeiler-Lehman color refinement (host-side, stateful hashmap like
    the reference's ``self.hashmap``; no parameters)."""

    def __init__(self):
        self.hashmap = {}

    def reset_parameters(self):
        self.hashmap = {}

    def __call__(self, x, senders, receivers, num_nodes=None):
        x = np.asarray(x)
        if x.ndim > 1:
            x = x.argmax(axis=-1)
        n = num_nodes if num_nodes is not None else len(x)
        senders, receivers = np.asarray(senders), np.asarray(receivers)
        out = np.empty(n, np.int64)
        nbrs = [[] for _ in range(n)]
        for s, r in zip(senders, receivers):
            nbrs[r].append(int(x[s]))
        for v in range(n):
            key = hash((int(x[v]),) + tuple(sorted(nbrs[v])))
            if key not in self.hashmap:
                self.hashmap[key] = len(self.hashmap)
            out[v] = self.hashmap[key]
        return out

    def histogram(self, x, graph_ids=None, norm: bool = False):
        x = np.asarray(x)
        if graph_ids is None:
            graph_ids = np.zeros(len(x), np.int64)
        graph_ids = np.asarray(graph_ids)
        nc = len(self.hashmap)
        b = int(graph_ids.max()) + 1
        out = np.zeros((b, nc), np.float64)
        np.add.at(out, (graph_ids, x), 1)
        if norm:
            out = out / np.maximum(
                np.linalg.norm(out, axis=-1, keepdims=True), 1e-12
            )
        return out


# The reference ships FastRGCNConv (rgcn_conv.py:239) as a perf variant of
# RGCNConv that trades memory for speed by materializing per-edge weight
# matrices instead of looping relations.  Here the statically-unrolled
# masked-relation RGCNConv is already the XLA-friendly fused form (one
# program, no data-dependent loops), so the fast variant is the same class.
FastRGCNConv = RGCNConv
