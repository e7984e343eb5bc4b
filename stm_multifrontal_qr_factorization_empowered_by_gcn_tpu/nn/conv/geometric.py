"""Geometric / point-cloud convolution family.

TPU-native re-designs of the reference layers that depended on native
extensions (torch-spline-conv, torch-cluster):

* :class:`SplineConv`   — ``torch_geometric/nn/conv/spline_conv.py:20-141``
* :class:`GMMConv`      — ``gmm_conv.py:17-151``
* :class:`PointNetConv` — ``point_conv.py`` (class ``PointConv``)
* :class:`FeaStConv`    — ``feast_conv.py:15-100``
* :class:`GravNetConv`  — ``gravnet_conv.py:20-116``
* :class:`XConv`        — ``x_conv.py:19-161``

Design notes (TPU-first):
- SplineConv's B-spline basis (the ``spline_basis``/``spline_weighting``
  CUDA kernels) is computed in pure JAX: the sparse per-edge basis (only
  ``(degree+1)^dim`` active corners) is scattered into a dense ``[E, K]``
  coefficient vector and contracted with the full kernel bank in one
  einsum — trading a small factor of FLOPs for a dense MXU contraction
  with static shapes (no per-edge weight gather).
- kNN construction (torch-cluster) is the dense masked top-k of
  ``utils/knn.py`` — O(N^2) on the MXU, static shapes, batch-safe.
- XConv is not message passing in the reference either; here it consumes the
  padded ``[N, K]`` neighbor table directly (its natural TPU shape).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.segment import aggregate
from ...utils.knn import knn, knn_graph
from ..inits import glorot, kaiming_uniform, linear_bias, normal, uniform, zeros
from ..message_passing import MessagePassing, propagate, resolve_graph_args


def _maybe_add_self_loops(senders, receivers, num_nodes, edge_mask, edge_attr=None):
    """Drop existing self-loops (by masking) and append one per node —
    static-shape equivalent of the reference's remove+add_self_loops dance
    (``feast_conv.py:75-81``).  Appended loops carry zero edge_attr."""
    loops = jnp.arange(num_nodes, dtype=senders.dtype)
    not_loop = senders != receivers
    mask = not_loop if edge_mask is None else (edge_mask & not_loop)
    s = jnp.concatenate([senders, loops])
    r = jnp.concatenate([receivers, loops])
    m = jnp.concatenate([mask, jnp.ones(num_nodes, bool)])
    if edge_attr is not None:
        pad = jnp.zeros((num_nodes,) + edge_attr.shape[1:], edge_attr.dtype)
        edge_attr = jnp.concatenate([edge_attr, pad])
    return s, r, m, edge_attr


# ---------------------------------------------------------------------------
# SplineConv
# ---------------------------------------------------------------------------

def spline_basis(
    pseudo: jnp.ndarray,
    kernel_size: Sequence[int],
    is_open_spline: Sequence[bool],
    degree: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-edge B-spline basis — pure-JAX equivalent of torch-spline-conv's
    ``spline_basis`` (reference ``spline_conv.py:134``).

    ``pseudo`` is ``[E, dim]`` in [0, 1].  Returns ``(coeff [E, S],
    corner [E, S])`` with ``S=(degree+1)^dim`` active kernel corners per
    edge: coefficient = product over dims of the 1-D basis, corner = mixed-
    radix flat index into the ``prod(kernel_size)`` kernel bank.
    """
    if degree != 1:
        raise NotImplementedError("only degree-1 (linear) B-splines")
    e, dim = pseudo.shape
    coeffs, corners = [], []
    stride = 1
    # accumulate per-dim (value, knot) pairs; combine via outer products
    dim_c, dim_i = [], []
    for d in range(dim):
        k = int(kernel_size[d])
        m = k - 1 if is_open_spline[d] else k
        u = pseudo[:, d] * m
        lo = jnp.clip(jnp.floor(u), 0, m - 1) if m > 0 else jnp.zeros_like(u)
        frac = u - lo
        lo = lo.astype(jnp.int32)
        hi = lo + 1
        if not is_open_spline[d]:
            hi = hi % k
        else:
            hi = jnp.minimum(hi, k - 1)
        dim_c.append(jnp.stack([1.0 - frac, frac], axis=1))   # [E, 2]
        dim_i.append(jnp.stack([lo, hi], axis=1))              # [E, 2]
    coeff = dim_c[0]
    corner = dim_i[0]
    stride = int(kernel_size[0])
    for d in range(1, dim):
        coeff = (coeff[:, :, None] * dim_c[d][:, None, :]).reshape(e, -1)
        corner = (corner[:, :, None] + stride * dim_i[d][:, None, :]).reshape(e, -1)
        stride *= int(kernel_size[d])
    return coeff, corner


class SplineConv(MessagePassing):
    """``x'_i = (1/|N(i)|) Σ_j x_j · h_Θ(e_ij)`` with a B-spline kernel bank
    (reference ``spline_conv.py:20-141``)."""

    in_channels: Union[int, Tuple[int, int]]
    out_channels: int
    dim: int
    kernel_size: Union[int, Tuple[int, ...]]
    is_open_spline: Union[bool, Tuple[bool, ...]] = True
    degree: int = 1
    aggr: str = "mean"
    root_weight: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, graph_or_senders, receivers=None, *,
                 edge_attr=None, num_nodes=None, edge_mask=None):
        x_pair, senders, receivers, num_nodes, edge_mask, g_attr = (
            resolve_graph_args(x, graph_or_senders, receivers, num_nodes, edge_mask)
        )
        edge_attr = g_attr if edge_attr is None else edge_attr
        dim = self.dim
        ks = (
            (self.kernel_size,) * dim
            if isinstance(self.kernel_size, int)
            else tuple(self.kernel_size)
        )
        open_ = (
            (self.is_open_spline,) * dim
            if isinstance(self.is_open_spline, bool)
            else tuple(self.is_open_spline)
        )
        K = int(np.prod(ks))
        in_src, in_dst = (
            self.in_channels
            if isinstance(self.in_channels, tuple)
            else (self.in_channels, self.in_channels)
        )
        weight = self.param(
            "weight", uniform(K * in_src), (K, in_src, self.out_channels)
        )

        coeff, corner = spline_basis(edge_attr, ks, open_, self.degree)
        # densify the sparse basis into [E, K] and contract with the bank in
        # one einsum: alpha_ek (W_k x_j)_o — static-shaped MXU work instead of
        # the reference's per-edge gather of [in,out] kernel slices.
        alpha = jnp.zeros((coeff.shape[0], K), coeff.dtype)
        alpha = alpha.at[
            jnp.arange(coeff.shape[0])[:, None], corner
        ].add(coeff)

        def message_fn(x_j, x_i, e_attr, e_w):
            return jnp.einsum(
                "ek,ei,kio->eo", alpha, x_j, weight,
                preferred_element_type=jnp.float32,
            ).astype(x_j.dtype)

        out = propagate(
            x_pair, senders, receivers, num_nodes,
            message_fn=message_fn, edge_mask=edge_mask, aggr=self.aggr,
        )
        if self.root_weight:
            root = self.param(
                "root", uniform(K * in_src), (in_dst, self.out_channels)
            )
            out = out + x_pair[1] @ root
        if self.use_bias:
            out = out + self.param("bias", zeros(), (self.out_channels,))
        return out


# ---------------------------------------------------------------------------
# GMMConv
# ---------------------------------------------------------------------------

class GMMConv(MessagePassing):
    """Gaussian-mixture-model conv (MoNet) — reference ``gmm_conv.py:17-151``.

    ``x'_i = (1/|N(i)|) Σ_j Σ_k w_k(e_ij) · (x_j g_k)`` with
    ``w_k(e) = exp(-0.5 (e-μ_k)^T Σ_k^{-1} (e-μ_k))`` (matching the
    reference *code*, which — unlike its docstring — does not divide by K).
    """

    in_channels: Union[int, Tuple[int, int]]
    out_channels: int
    dim: int
    kernel_size: int
    separate_gaussians: bool = False
    aggr: str = "mean"
    root_weight: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, graph_or_senders, receivers=None, *,
                 edge_attr=None, num_nodes=None, edge_mask=None):
        x_pair, senders, receivers, num_nodes, edge_mask, g_attr = (
            resolve_graph_args(x, graph_or_senders, receivers, num_nodes, edge_mask)
        )
        edge_attr = g_attr if edge_attr is None else edge_attr
        in_src, in_dst = (
            self.in_channels
            if isinstance(self.in_channels, tuple)
            else (self.in_channels, self.in_channels)
        )
        K, M, D = self.kernel_size, self.out_channels, self.dim
        EPS = 1e-15
        g = self.param("g", glorot(), (in_src, M * K))
        if not self.separate_gaussians:
            mu = self.param("mu", glorot(), (K, D))
            sigma = self.param("sigma", glorot(), (K, D))

            def message_fn(x_j, x_i, e_attr, e_w):
                gauss = -0.5 * (e_attr[:, None, :] - mu[None]) ** 2
                gauss = gauss / (EPS + sigma[None] ** 2)
                gauss = jnp.exp(jnp.sum(gauss, axis=-1))          # [E, K]
                return jnp.sum(
                    x_j.reshape(-1, K, M) * gauss[:, :, None], axis=-2
                )

            xs = (x_pair[0] @ g, x_pair[1])
        else:
            mu = self.param("mu", glorot(), (in_src, M, K, D))
            sigma = self.param("sigma", glorot(), (in_src, M, K, D))

            def message_fn(x_j, x_i, e_attr, e_w):
                # [E,1,1,1,D] vs [1,F,M,K,D] (reference gmm_conv.py:137-145)
                gauss = -0.5 * (e_attr[:, None, None, None, :] - mu[None]) ** 2
                gauss = gauss / (EPS + sigma[None] ** 2)
                gauss = jnp.exp(jnp.sum(gauss, axis=-1))          # [E, F, M, K]
                gauss = jnp.sum(gauss * g.reshape(1, in_src, M, K), axis=-1)
                return jnp.einsum("ef,efm->em", x_j, gauss)

            xs = x_pair
        out = propagate(
            xs, senders, receivers, num_nodes,
            message_fn=message_fn, edge_attr=edge_attr,
            edge_mask=edge_mask, aggr=self.aggr,
        )
        if self.root_weight:
            root = self.param("root", glorot(), (in_dst, M))
            out = out + x_pair[1] @ root
        if self.use_bias:
            out = out + self.param("bias", zeros(), (M,))
        return out


# ---------------------------------------------------------------------------
# PointNetConv (reference name: PointConv)
# ---------------------------------------------------------------------------

class PointNetConv(MessagePassing):
    """PointNet++ conv — reference ``point_conv.py:16-100``.

    ``x'_i = max_j γ(h([x_j ‖ p_j − p_i]))`` with optional local/global MLPs
    passed as flax callables.
    """

    local_nn: Optional[Callable] = None
    global_nn: Optional[Callable] = None
    add_self_loops: bool = True
    aggr: str = "max"

    @nn.compact
    def __call__(self, x, pos, graph_or_senders, receivers=None, *,
                 num_nodes=None, edge_mask=None):
        pos_pair = pos if isinstance(pos, tuple) else (pos, pos)
        x_pair = x if isinstance(x, tuple) else (x, x)
        _, senders, receivers, num_nodes, edge_mask, _ = resolve_graph_args(
            pos_pair, graph_or_senders, receivers, num_nodes, edge_mask
        )
        if self.add_self_loops:
            senders, receivers, edge_mask, _ = _maybe_add_self_loops(
                senders, receivers, num_nodes, edge_mask
            )

        rel = pos_pair[0][senders] - pos_pair[1][receivers]
        if x_pair[0] is not None:
            msg = jnp.concatenate([x_pair[0][senders], rel], axis=-1)
        else:
            msg = rel
        if self.local_nn is not None:
            msg = self.local_nn(msg)
        out = aggregate(
            self.aggr, msg, receivers, num_nodes, mask=edge_mask
        )
        if self.global_nn is not None:
            out = self.global_nn(out)
        return out


PointConv = PointNetConv  # reference alias


# ---------------------------------------------------------------------------
# FeaStConv
# ---------------------------------------------------------------------------

class FeaStConv(MessagePassing):
    """Feature-steered conv — reference ``feast_conv.py:15-100``.

    ``x'_i = (1/|N(i)|) Σ_j Σ_h q_h(x_i, x_j) W_h x_j`` with
    ``q = softmax_h(u_h^T (x_j − x_i) + c_h)`` (translation invariant).
    """

    in_channels: int
    out_channels: int
    heads: int = 1
    add_self_loops: bool = True
    use_bias: bool = True
    aggr: str = "mean"

    @nn.compact
    def __call__(self, x, graph_or_senders, receivers=None, *,
                 num_nodes=None, edge_mask=None):
        x_pair, senders, receivers, num_nodes, edge_mask, _ = (
            resolve_graph_args(x, graph_or_senders, receivers, num_nodes, edge_mask)
        )
        if self.add_self_loops:
            senders, receivers, edge_mask, _ = _maybe_add_self_loops(
                senders, receivers, num_nodes, edge_mask
            )
        H, M = self.heads, self.out_channels
        weight = self.param("weight", normal(0.1), (self.in_channels, H * M))
        u = self.param("u", normal(0.1), (self.in_channels, H))
        c = self.param("c", normal(0.1), (H,))

        def message_fn(x_j, x_i, e_attr, e_w):
            q = jax.nn.softmax((x_j - x_i) @ u + c, axis=1)       # [E, H]
            xj = (x_j @ weight).reshape(-1, H, M)
            return jnp.sum(xj * q[:, :, None], axis=1)

        out = propagate(
            x_pair, senders, receivers, num_nodes,
            message_fn=message_fn, edge_mask=edge_mask, aggr=self.aggr,
        )
        if self.use_bias:
            out = out + self.param("bias", normal(0.1), (M,))
        return out


# ---------------------------------------------------------------------------
# GravNetConv
# ---------------------------------------------------------------------------

class GravNetConv(MessagePassing):
    """GravNet — reference ``gravnet_conv.py:20-116``: kNN in a learned
    embedding space, messages weighted by ``exp(-10 d^2)``, mean‖max
    aggregation.  The torch-cluster kNN becomes ``utils/knn.knn`` (dense
    masked top-k on the MXU)."""

    in_channels: int
    out_channels: int
    space_dimensions: int
    propagate_dimensions: int
    k: int

    @nn.compact
    def __call__(self, x, batch=None, *, node_mask=None):
        x_pair = x if isinstance(x, tuple) else (x, x)
        b_pair = batch if isinstance(batch, tuple) else (batch, batch)
        n_dst = x_pair[1].shape[0]

        lin_s = nn.Dense(self.space_dimensions, name="lin_s")
        lin_h = nn.Dense(self.propagate_dimensions, name="lin_h")
        h_l = lin_h(x_pair[0])
        s_l = lin_s(x_pair[0])
        s_r = lin_s(x_pair[1]) if isinstance(x, tuple) else s_l

        idx, sqd = knn(s_l, s_r, self.k, b_pair[0], b_pair[1],
                       mask_src=node_mask)                       # [Ndst, k]
        w = jnp.exp(-10.0 * sqd)                                  # [Ndst, k]
        neigh = h_l[idx]                                          # [Ndst, k, P]
        valid = jnp.isfinite(sqd)
        wv = jnp.where(valid, w, 0.0)
        out_mean = jnp.sum(neigh * wv[..., None], axis=1) / jnp.maximum(
            jnp.sum(valid, axis=1, keepdims=True), 1
        )
        out_max = jnp.max(
            jnp.where(valid[..., None], neigh * wv[..., None], -jnp.inf), axis=1
        )
        out_max = jnp.where(jnp.isfinite(out_max), out_max, 0.0)
        out = jnp.concatenate([out_mean, out_max, x_pair[1]], axis=-1)
        return nn.Dense(self.out_channels, name="lin")(out)


# ---------------------------------------------------------------------------
# XConv
# ---------------------------------------------------------------------------

class XConv(nn.Module):
    """PointCNN X-transform conv — reference ``x_conv.py:19-161``.

    Dense per-node neighborhood formulation: lift relative positions
    (``mlp1``), learn a K×K transform (``mlp2``), apply it to the stacked
    neighborhood features, finish with a depthwise+dense conv.  Consumes the
    padded ``[N, K]`` kNN table from ``utils/knn`` directly — already the
    static shape the reference reaches via ``x.view(N, K, C)``
    (``x_conv.py:141``).
    """

    in_channels: int
    out_channels: int
    dim: int
    kernel_size: int
    hidden_channels: Optional[int] = None
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, pos, batch=None, *, train: bool = False,
                 rng=None, node_mask=None):
        N, D = pos.shape
        K = self.kernel_size
        hidden = self.hidden_channels or self.in_channels // 4
        assert hidden > 0

        idx, _ = knn(pos, pos, K * self.dilation, batch, batch,
                     mask_src=node_mask)                          # [N, K*dil]
        if self.dilation > 1:
            if rng is None:
                rng = self.make_rng("dilation") if self.has_rng("dilation") else jax.random.PRNGKey(0)
            choice = jax.random.randint(rng, (N, K), 0, K * self.dilation)
            idx = jnp.take_along_axis(idx, choice, axis=1)

        rel = pos[idx] - pos[:, None, :]                          # [N, K, D]

        def bn(z):
            return nn.LayerNorm(use_scale=True, use_bias=True)(z)

        # mlp1: per-point lift of relative positions -> [N, K, hidden]
        h = nn.Dense(hidden)(rel)
        h = nn.elu(h)
        h = bn(h)
        h = nn.Dense(hidden)(h)
        h = nn.elu(h)
        h = bn(h)

        if x is not None:
            h = jnp.concatenate([h, x[idx]], axis=-1)             # [N, K, C]
        C = h.shape[-1]

        # mlp2: the X-transform [N, K, K] from the flattened neighborhood
        t = nn.Dense(K * K)(rel.reshape(N, K * D))
        t = nn.elu(t)
        t = bn(t)
        t = t.reshape(N, K, K)
        for _ in range(2):
            # depthwise conv over the K axis (reference Conv1d groups=K)
            w = self.param(
                f"tconv_{_}", kaiming_uniform(), (K, K, K)
            )  # [in_chan K, out-per-chan K, length K]
            t = jnp.einsum("nkl,kml->nkm", t, w)
            if _ == 0:
                t = nn.elu(t)
                t = bn(t)
        t = bn(t)

        # apply transform: [N, K, K] @ [N, K, C] -> [N, K, C]
        ht = jnp.einsum("nkm,nmc->nkc", t, h)

        # final depthwise (over K) + dense projection (reference conv)
        dm = -(-self.out_channels // C)
        wd = self.param("dw", kaiming_uniform(), (C, dm, K))
        z = jnp.einsum("nkc,cdk->ncd", ht, wd).reshape(N, C * dm)
        return nn.Dense(self.out_channels, use_bias=self.use_bias)(z)
