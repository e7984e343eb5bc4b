"""Dense (padded-adjacency) layers — reference ``torch_geometric/nn/dense/*``
(DenseGCNConv, DenseSAGEConv, DenseGraphConv, DenseGINConv, dense_diff_pool,
dense_mincut_pool).

These operate on ``adj [B, N, N]`` + ``x [B, N, F]`` + optional ``mask
[B, N]`` — the shapes SURVEY.md §2.1 P19 calls "the closest analog to
TPU-friendly fixed shapes"; everything is batched matmul on the MXU.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..inits import glorot, kaiming_uniform, linear_bias, zeros

EPS = 1e-15


def _apply_mask(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    return x if mask is None else x * mask[..., None].astype(x.dtype)


class DenseGCNConv(nn.Module):
    in_channels: int
    out_channels: int
    improved: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, adj, mask=None, add_loop: bool = True):
        b, n, _ = x.shape
        if add_loop:
            eye = jnp.eye(n, dtype=x.dtype) * (2.0 if self.improved else 1.0)
            adj = adj + eye[None]
        w = self.param("weight", glorot(), (self.in_channels, self.out_channels))
        out = x @ w
        deg_inv_sqrt = jax.lax.rsqrt(jnp.clip(adj.sum(-1), min=1))
        adj = deg_inv_sqrt[..., None] * adj * deg_inv_sqrt[..., None, :]
        out = jnp.einsum("bij,bjf->bif", adj, out)
        if self.use_bias:
            out = out + self.param("bias", zeros(), (self.out_channels,))
        return _apply_mask(out, mask)


class DenseSAGEConv(nn.Module):
    in_channels: int
    out_channels: int
    normalize: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, adj, mask=None):
        out = jnp.einsum("bij,bjf->bif", adj, x)
        out = out / jnp.clip(adj.sum(-1, keepdims=True), min=1)
        w_l = self.param("lin_rel_w", kaiming_uniform(), (self.in_channels, self.out_channels))
        w_r = self.param("lin_root_w", kaiming_uniform(), (self.in_channels, self.out_channels))
        out = out @ w_l + x @ w_r
        if self.use_bias:
            out = out + self.param(
                "bias", linear_bias(self.in_channels), (self.out_channels,)
            )
        if self.normalize:
            out = out / jnp.clip(
                jnp.linalg.norm(out, axis=-1, keepdims=True), min=1e-12
            )
        return _apply_mask(out, mask)


class DenseGraphConv(nn.Module):
    in_channels: int
    out_channels: int
    aggr: str = "add"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, adj, mask=None):
        out = jnp.einsum("bij,bjf->bif", adj, x)
        if self.aggr == "mean":
            out = out / jnp.clip(adj.sum(-1, keepdims=True), min=1)
        w_l = self.param("lin_l_w", kaiming_uniform(), (self.in_channels, self.out_channels))
        w_r = self.param("lin_r_w", kaiming_uniform(), (self.in_channels, self.out_channels))
        out = out @ w_l + x @ w_r
        if self.use_bias:
            out = out + self.param(
                "bias", linear_bias(self.in_channels), (self.out_channels,)
            )
        return _apply_mask(out, mask)


class DenseGINConv(nn.Module):
    mlp: Callable
    eps: float = 0.0
    train_eps: bool = False

    @nn.compact
    def __call__(self, x, adj, mask=None, add_loop: bool = True):
        out = jnp.einsum("bij,bjf->bif", adj, x)
        eps = (
            self.param("eps", lambda *_: jnp.asarray(self.eps))
            if self.train_eps else self.eps
        )
        if add_loop:
            out = out + (1 + eps) * x
        return _apply_mask(self.mlp(out), mask)


def dense_diff_pool(
    x: jnp.ndarray, adj: jnp.ndarray, s: jnp.ndarray, mask=None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """DiffPool (reference ``dense/diff_pool.py``): soft cluster assignment
    ``s [B,N,C]`` → pooled ``(x', adj', link_loss, ent_loss)``."""
    s = jax.nn.softmax(s, axis=-1)
    if mask is not None:
        s = s * mask[..., None].astype(s.dtype)
    out_x = jnp.einsum("bnc,bnf->bcf", s, x)
    out_adj = jnp.einsum("bnc,bnm,bmd->bcd", s, adj, s)
    link_loss = jnp.linalg.norm(
        adj - jnp.einsum("bnc,bmc->bnm", s, s), axis=(-2, -1)
    ) / jnp.maximum(adj.shape[1] * adj.shape[2], 1)
    ent = -jnp.sum(s * jnp.log(s + EPS), axis=-1)
    if mask is not None:
        ent = ent * mask.astype(ent.dtype)
    ent_loss = jnp.mean(jnp.sum(ent, axis=-1))
    return out_x, out_adj, jnp.mean(link_loss), ent_loss


def dense_mincut_pool(
    x: jnp.ndarray, adj: jnp.ndarray, s: jnp.ndarray, mask=None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """MinCut pooling (reference ``dense/mincut_pool.py``)."""
    s = jax.nn.softmax(s, axis=-1)
    if mask is not None:
        s = s * mask[..., None].astype(s.dtype)
    out_x = jnp.einsum("bnc,bnf->bcf", s, x)
    out_adj = jnp.einsum("bnc,bnm,bmd->bcd", s, adj, s)

    # mincut loss: -Tr(SᵀAS)/Tr(SᵀDS)
    num = jnp.einsum("bcc->b", out_adj)
    d = jnp.sum(adj, axis=-1)
    den = jnp.einsum("bnc,bn,bnc->b", s, d, s)
    mincut_loss = jnp.mean(-(num / jnp.maximum(den, EPS)))

    # orthogonality loss: ‖SᵀS/‖SᵀS‖ − I/√C‖
    ss = jnp.einsum("bnc,bnd->bcd", s, s)
    c = s.shape[-1]
    ss_norm = ss / jnp.maximum(
        jnp.linalg.norm(ss, axis=(-2, -1), keepdims=True), EPS
    )
    eye = jnp.eye(c, dtype=s.dtype)[None] / jnp.sqrt(jnp.asarray(c, s.dtype))
    ortho_loss = jnp.mean(jnp.linalg.norm(ss_norm - eye, axis=(-2, -1)))

    # zero pooled diagonal (reference normalizes adj afterwards)
    out_adj = out_adj * (1 - jnp.eye(c, dtype=out_adj.dtype)[None])
    deg = jnp.sum(out_adj, axis=-1)
    dis = jax.lax.rsqrt(jnp.clip(deg, min=EPS))
    out_adj = dis[..., None] * out_adj * dis[..., None, :]
    return out_x, out_adj, mincut_loss, ortho_loss


def to_dense_adjacency(senders, receivers, num_nodes, edge_weight=None, edge_mask=None):
    """COO → [N, N] dense adjacency (single graph)."""
    w = (
        jnp.ones(senders.shape[0], jnp.float32)
        if edge_weight is None else edge_weight
    )
    if edge_mask is not None:
        w = jnp.where(edge_mask, w, 0)
    return jnp.zeros((num_nodes, num_nodes), w.dtype).at[receivers, senders].add(w)
