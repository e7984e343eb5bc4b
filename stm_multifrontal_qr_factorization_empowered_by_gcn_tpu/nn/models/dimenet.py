"""DimeNet — reference ``torch_geometric/nn/models/dimenet.py`` (Klicpera et
al., "Directional Message Passing for Molecular Graphs", ICLR 2020).

Directional message passing over *edge* embeddings: messages m_ji are updated
from incoming messages m_kj modulated by a radial Bessel basis of d_kj and a
spherical basis of the angle ∠(kj, ji), combined through a bilinear tensor.

TPU-native redesign of the reference's host machinery:

* the reference generates its basis functions by **sympy codegen**
  (``dimenet_utils.bessel_basis`` / ``real_sph_harm`` lambdified per (l, n));
  here the same functions are evaluated by **recurrence** inside jit — the
  upward recurrence for spherical Bessel j_l and the Legendre recurrence for
  the m=0 real spherical harmonics — with the Bessel roots z_{l,n} and
  normalizers 1/j_{l+1}(z_{l,n}) precomputed numerically at host (scipy).
  Identical math, no codegen, fully fused by XLA.
* triplet construction (``DimeNet.triplets``: torch_sparse row-slicing) and
  the radius graph are host-side preprocessing with **static budgets** and
  validity masks (:func:`dimenet_graph`) — the TPU forward is shape-static.
* the bilinear ``einsum('wj,wl,ijl->wi')`` maps straight onto the MXU.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..inits import glorot_orthogonal
from .schnet import radius_graph_padded


def swish(x):
    return x * jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# host-side graph + triplet prep (static budgets)
# ---------------------------------------------------------------------------
class DimeNetGraph(NamedTuple):
    senders: np.ndarray      # [E] j of edge j->i
    receivers: np.ndarray    # [E] i
    edge_mask: np.ndarray    # [E]
    idx_kj: np.ndarray       # [T] edge id of k->j
    idx_ji: np.ndarray       # [T] edge id of j->i
    triplet_mask: np.ndarray  # [T]


def dimenet_graph(
    pos: np.ndarray, cutoff: float, max_edges: int, max_triplets: int
) -> DimeNetGraph:
    """Radius graph + (k->j->i) triplet tables with static budgets
    (reference ``DimeNet.triplets``, ``dimenet.py:413-434``)."""
    senders, receivers, emask = radius_graph_padded(pos, cutoff, max_edges)
    e = int(emask.sum())
    # triplets: for each edge (j -> i), pair with every edge (k -> j), k != i
    in_edges = [[] for _ in range(len(pos))]  # node -> incoming edge ids
    for eid in range(e):
        in_edges[receivers[eid]].append(eid)
    kj, ji = [], []
    for eid in range(e):
        j, i = senders[eid], receivers[eid]
        for e2 in in_edges[j]:
            if senders[e2] == i:
                continue
            kj.append(e2)
            ji.append(eid)
    t = min(len(kj), max_triplets)
    idx_kj = np.zeros(max_triplets, np.int32)
    idx_ji = np.zeros(max_triplets, np.int32)
    tmask = np.zeros(max_triplets, bool)
    idx_kj[:t] = kj[:t]
    idx_ji[:t] = ji[:t]
    tmask[:t] = True
    return DimeNetGraph(senders, receivers, emask, idx_kj, idx_ji, tmask)


def _bessel_roots(num_spherical: int, num_radial: int) -> np.ndarray:
    """z_{l,n}: first ``num_radial`` positive roots of j_l, l < num_spherical."""
    from scipy.optimize import brentq
    from scipy.special import spherical_jn

    roots = np.zeros((num_spherical, num_radial))
    roots[0] = np.arange(1, num_radial + 1) * math.pi  # j_0 = sinc
    # roots of j_l interlace those of j_{l-1}
    prev = np.concatenate([[0.0], roots[0], [roots[0, -1] + math.pi]])
    for l in range(1, num_spherical):
        cur = []
        for k in range(len(prev) - 1):
            a, b = prev[k] + 1e-8, prev[k + 1] - 1e-8
            fa = spherical_jn(l, a)
            fb = spherical_jn(l, b)
            if fa * fb < 0:
                cur.append(brentq(lambda x: spherical_jn(l, x), a, b))
            if len(cur) == num_radial + 1:
                break
        while len(cur) < num_radial + 1:  # extend the search window
            a = (cur[-1] if cur else prev[-1]) + 1e-3
            b = a + math.pi
            while spherical_jn(l, a) * spherical_jn(l, b) > 0:
                b += math.pi
            cur.append(brentq(lambda x: spherical_jn(l, x), a, b))
        roots[l] = cur[:num_radial]
        prev = np.concatenate([[0.0], np.asarray(cur)])
    return roots


def _spherical_jl(l_max: int, x: jnp.ndarray) -> jnp.ndarray:
    """[l_max, ...] spherical Bessel j_l(x), stable in fp32 everywhere:
    upward recurrence for x >= l (stable region), 6-term ascending series
    j_l = Σ_k (−1)^k x^{2k+l} / (2^k k! (2l+2k+1)!!) below (where the
    recurrence — and the reference's equivalent sympy closed forms —
    catastrophically cancel)."""
    xs = jnp.where(jnp.abs(x) < 1e-8, 1e-8, x)
    j0 = jnp.sin(xs) / xs
    rec = [j0]
    if l_max > 1:
        rec.append(jnp.sin(xs) / xs**2 - jnp.cos(xs) / xs)
        for l in range(2, l_max):
            rec.append((2 * l - 1) / xs * rec[-1] - rec[-2])
    out = []
    x2 = xs * xs
    for l in range(l_max):
        if l == 0:
            out.append(rec[0])
            continue
        # ascending series (6 terms)
        dfact = 1.0
        for m in range(1, 2 * l + 2, 2):
            dfact *= m
        term = xs**l / dfact
        series = term
        denom = 1.0
        for k in range(1, 6):
            denom *= 2 * k * (2 * l + 2 * k + 1)
            series = series + (-1) ** k * term * x2**k / denom
        out.append(jnp.where(xs >= l, rec[l], series))
    return jnp.stack(out)


def _legendre_cos(l_max: int, theta: jnp.ndarray) -> jnp.ndarray:
    """[l_max, ...] Y_l^0-proportional Legendre P_l(cos θ) with the real
    spherical-harmonic normalizer sqrt((2l+1)/(4π))."""
    c = jnp.cos(theta)
    ps = [jnp.ones_like(c)]
    if l_max > 1:
        ps.append(c)
        for l in range(2, l_max):
            ps.append(((2 * l - 1) * c * ps[-1] - (l - 1) * ps[-2]) / l)
    norm = jnp.asarray(
        [math.sqrt((2 * l + 1) / (4 * math.pi)) for l in range(l_max)]
    )
    return jnp.stack(ps[:l_max]) * norm[:, None]


def envelope(x: jnp.ndarray, exponent: int) -> jnp.ndarray:
    """Smooth-cutoff polynomial envelope u(x) (reference ``Envelope``)."""
    p = exponent + 1
    a = -(p + 1) * (p + 2) / 2
    b = p * (p + 2)
    c = -p * (p + 1) / 2
    xp = x ** (p - 1)
    return 1.0 / x + a * xp + b * xp * x + c * xp * x * x


class BesselBasisLayer(nn.Module):
    num_radial: int
    cutoff: float = 5.0
    envelope_exponent: int = 5

    @nn.compact
    def __call__(self, dist: jnp.ndarray) -> jnp.ndarray:
        freq = self.param(
            "freq",
            lambda _k, s: jnp.arange(1, s[0] + 1, dtype=jnp.float32) * math.pi,
            (self.num_radial,),
        )
        d = (dist / self.cutoff)[:, None]
        d = jnp.maximum(d, 1e-9)
        return envelope(d, self.envelope_exponent) * jnp.sin(freq * d)


class SphericalBasisLayer(nn.Module):
    num_spherical: int
    num_radial: int
    cutoff: float = 5.0
    envelope_exponent: int = 5

    def setup(self):
        roots = _bessel_roots(self.num_spherical, self.num_radial)
        from scipy.special import spherical_jn

        # per-(l, n) normalizer so each radial basis has unit L2 norm on
        # [0, 1] (the dimenet_utils.bessel_basis normalization)
        norm = np.zeros_like(roots)
        for l in range(self.num_spherical):
            norm[l] = np.sqrt(2.0) / np.abs(
                spherical_jn(l + 1, roots[l])
            )
        self._roots = jnp.asarray(roots, jnp.float32)      # [S, R]
        self._norm = jnp.asarray(norm, jnp.float32)        # [S, R]

    def __call__(self, dist, angle, idx_kj) -> jnp.ndarray:
        d = jnp.maximum(dist / self.cutoff, 1e-9)           # [E]
        rbf = []
        for l in range(self.num_spherical):
            args = self._roots[l][None, :] * d[:, None]     # [E, R]
            jl_l = _spherical_jl(l + 1, args)[l]            # [E, R]
            rbf.append(self._norm[l][None, :] * jl_l)
        rbf = jnp.stack(rbf, axis=1)                         # [E, S, R]
        u = envelope(d, self.envelope_exponent)[:, None, None]
        rbf = u * rbf
        cbf = _legendre_cos(self.num_spherical, angle).T     # [T, S]
        out = rbf[idx_kj] * cbf[:, :, None]                  # [T, S, R]
        return out.reshape(out.shape[0], -1)


class EmbeddingBlock(nn.Module):
    num_radial: int
    hidden_channels: int

    @nn.compact
    def __call__(self, z, rbf, i, j):
        emb = nn.Embed(
            95, self.hidden_channels,
            embedding_init=lambda k, s, d=jnp.float32: jax.random.uniform(
                k, s, d, -math.sqrt(3), math.sqrt(3)  # reference Embedding init
            ),
        )
        x = emb(z)
        rbf = swish(nn.Dense(self.hidden_channels, name="lin_rbf")(rbf))
        cat = jnp.concatenate([x[i], x[j], rbf], axis=-1)
        return swish(nn.Dense(self.hidden_channels, name="lin")(cat))


class ResidualLayer(nn.Module):
    hidden_channels: int

    @nn.compact
    def __call__(self, x):
        h = swish(nn.Dense(self.hidden_channels,
                           kernel_init=glorot_orthogonal(2.0))(x))
        h = swish(nn.Dense(self.hidden_channels,
                           kernel_init=glorot_orthogonal(2.0))(h))
        return x + h


class InteractionBlock(nn.Module):
    hidden_channels: int
    num_bilinear: int
    num_spherical: int
    num_radial: int
    num_before_skip: int = 1
    num_after_skip: int = 2

    @nn.compact
    def __call__(self, x, rbf, sbf, idx_kj, idx_ji, triplet_mask):
        h = self.hidden_channels
        gi = glorot_orthogonal(2.0)
        rbf = nn.Dense(h, use_bias=False, kernel_init=gi, name="lin_rbf")(rbf)
        sbf = nn.Dense(self.num_bilinear, use_bias=False, kernel_init=gi,
                       name="lin_sbf")(sbf)
        x_ji = swish(nn.Dense(h, kernel_init=gi, name="lin_ji")(x))
        x_kj = swish(nn.Dense(h, kernel_init=gi, name="lin_kj")(x))
        x_kj = x_kj * rbf
        w = self.param(
            "W",
            nn.initializers.normal(stddev=2.0 / h),
            (h, self.num_bilinear, h),
        )
        t = jnp.einsum("wj,wl,ijl->wi", sbf, x_kj[idx_kj], w)  # [T, h] (MXU)
        t = jnp.where(triplet_mask[:, None], t, 0)
        x_kj = jax.ops.segment_sum(t, idx_ji, x.shape[0])

        hmsg = x_ji + x_kj
        for k in range(self.num_before_skip):
            hmsg = ResidualLayer(h, name=f"res_before_{k}")(hmsg)
        hmsg = swish(nn.Dense(h, kernel_init=gi, name="lin")(hmsg)) + x
        for k in range(self.num_after_skip):
            hmsg = ResidualLayer(h, name=f"res_after_{k}")(hmsg)
        return hmsg


class OutputBlock(nn.Module):
    num_radial: int
    hidden_channels: int
    out_channels: int
    num_layers: int = 3

    @nn.compact
    def __call__(self, x, rbf, i, num_nodes, edge_mask):
        gi = glorot_orthogonal(2.0)
        g = nn.Dense(self.hidden_channels, use_bias=False, kernel_init=gi,
                     name="lin_rbf")(rbf) * x
        g = jnp.where(edge_mask[:, None], g, 0)
        out = jax.ops.segment_sum(g, i, num_nodes)
        for k in range(self.num_layers):
            out = swish(nn.Dense(self.hidden_channels, kernel_init=gi,
                                 name=f"lin_{k}")(out))
        return nn.Dense(self.out_channels, use_bias=False,
                        kernel_init=nn.initializers.zeros, name="lin")(out)


class DimeNet(nn.Module):
    hidden_channels: int
    out_channels: int
    num_blocks: int
    num_bilinear: int
    num_spherical: int
    num_radial: int
    cutoff: float = 5.0
    envelope_exponent: int = 5
    num_before_skip: int = 1
    num_after_skip: int = 2
    num_output_layers: int = 3

    @nn.compact
    def __call__(
        self,
        z: jnp.ndarray,                   # [N] atomic numbers
        pos: jnp.ndarray,                 # [N, 3]
        g: DimeNetGraph,
        *,
        graph_ids: Optional[jnp.ndarray] = None,
        num_graphs: int = 1,
    ) -> jnp.ndarray:
        j, i = jnp.asarray(g.senders), jnp.asarray(g.receivers)
        emask = jnp.asarray(g.edge_mask)
        tmask = jnp.asarray(g.triplet_mask)
        idx_kj, idx_ji = jnp.asarray(g.idx_kj), jnp.asarray(g.idx_ji)
        n = pos.shape[0]

        dist = jnp.sqrt(jnp.sum((pos[i] - pos[j]) ** 2, axis=-1) + 1e-18)
        # angle at j between (j->i) and (k->j): reference computes the angle
        # at the *center* node of the triplet via atan2 of cross/dot
        pos_i = pos[i[idx_ji]]
        pos_ji = pos[j[idx_ji]] - pos_i
        pos_ki = pos[j[idx_kj]] - pos_i
        a = jnp.sum(pos_ji * pos_ki, axis=-1)
        b = jnp.linalg.norm(jnp.cross(pos_ji, pos_ki), axis=-1)
        angle = jnp.arctan2(b, a)

        rbf = BesselBasisLayer(self.num_radial, self.cutoff,
                               self.envelope_exponent, name="rbf")(dist)
        sbf = SphericalBasisLayer(self.num_spherical, self.num_radial,
                                  self.cutoff, self.envelope_exponent,
                                  name="sbf")(dist, angle, idx_kj)

        x = EmbeddingBlock(self.num_radial, self.hidden_channels,
                           name="emb")(z, rbf, i, j)
        x = jnp.where(emask[:, None], x, 0)
        p = OutputBlock(self.num_radial, self.hidden_channels,
                        self.out_channels, self.num_output_layers,
                        name="out_0")(x, rbf, i, n, emask)
        for blk in range(self.num_blocks):
            x = InteractionBlock(
                self.hidden_channels, self.num_bilinear, self.num_spherical,
                self.num_radial, self.num_before_skip, self.num_after_skip,
                name=f"int_{blk}",
            )(x, rbf, sbf, idx_kj, idx_ji, tmask)
            x = jnp.where(emask[:, None], x, 0)
            p = p + OutputBlock(
                self.num_radial, self.hidden_channels, self.out_channels,
                self.num_output_layers, name=f"out_{blk + 1}",
            )(x, rbf, i, n, emask)

        if graph_ids is None:
            return jnp.sum(p, axis=0)
        return jax.ops.segment_sum(p, graph_ids, num_graphs)
