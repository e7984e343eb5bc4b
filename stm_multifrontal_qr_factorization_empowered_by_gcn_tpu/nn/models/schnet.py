"""SchNet — reference ``torch_geometric/nn/models/schnet.py`` (continuous-
filter convolutions over interatomic distances).

TPU-native shape discipline: the radius graph is built host-side with a
static edge budget (padded, masked), distances/RBF run on device, and every
interaction block is dense matmul + one masked segment sum.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.segment import segment_sum


def radius_graph_padded(
    pos: np.ndarray, cutoff: float, max_edges: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side radius graph with a static edge budget.

    Returns (senders, receivers, edge_mask) each of length ``max_edges``.
    """
    pos = np.asarray(pos)
    d2 = ((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    r_idx, s_idx = np.nonzero(d2 <= cutoff * cutoff)
    e = len(s_idx)
    if e > max_edges:
        keep = np.argsort(d2[r_idx, s_idx])[:max_edges]
        s_idx, r_idx = s_idx[keep], r_idx[keep]
        e = max_edges
    senders = np.zeros(max_edges, np.int32)
    receivers = np.zeros(max_edges, np.int32)
    mask = np.zeros(max_edges, bool)
    senders[:e] = s_idx
    receivers[:e] = r_idx
    mask[:e] = True
    return senders, receivers, mask


class GaussianSmearing(nn.Module):
    """RBF distance expansion (reference ``schnet.py:GaussianSmearing``)."""

    start: float = 0.0
    stop: float = 5.0
    num_gaussians: int = 50

    def __call__(self, dist: jnp.ndarray) -> jnp.ndarray:
        offset = jnp.linspace(self.start, self.stop, self.num_gaussians)
        coeff = -0.5 / (offset[1] - offset[0]) ** 2
        return jnp.exp(coeff * (dist[:, None] - offset[None, :]) ** 2)


def shifted_softplus(x):
    return jax.nn.softplus(x) - jnp.log(2.0)


class CFConv(nn.Module):
    """Continuous-filter conv: W(e) generated from RBF features."""

    channels: int
    num_filters: int
    cutoff: float

    @nn.compact
    def __call__(self, x, senders, receivers, dist, rbf, edge_mask, num_nodes):
        w = nn.Dense(self.num_filters)(rbf)
        w = shifted_softplus(nn.Dense(self.num_filters)(shifted_softplus(w)))
        # cosine cutoff envelope (reference schnet.py:CFConv.forward)
        c = 0.5 * (jnp.cos(dist * jnp.pi / self.cutoff) + 1.0)
        w = w * c[:, None]
        h = nn.Dense(self.num_filters, use_bias=False)(x)
        msg = h[senders] * w
        out = segment_sum(msg, receivers, num_nodes, mask=edge_mask)
        return nn.Dense(self.channels)(out)


class InteractionBlock(nn.Module):
    channels: int
    num_filters: int
    cutoff: float

    @nn.compact
    def __call__(self, x, senders, receivers, dist, rbf, edge_mask, num_nodes):
        h = CFConv(self.channels, self.num_filters, self.cutoff)(
            x, senders, receivers, dist, rbf, edge_mask, num_nodes
        )
        h = shifted_softplus(h)
        return x + nn.Dense(self.channels)(h)


class SchNet(nn.Module):
    """Energy model: atom numbers + positions → scalar per graph (single
    molecule per call; batch by padded union like everything else)."""

    hidden_channels: int = 128
    num_filters: int = 128
    num_interactions: int = 6
    num_gaussians: int = 50
    cutoff: float = 10.0
    max_z: int = 100

    @nn.compact
    def __call__(
        self,
        z: jnp.ndarray,            # [N] atomic numbers (0 = padding)
        pos: jnp.ndarray,          # [N, 3]
        senders: jnp.ndarray,
        receivers: jnp.ndarray,
        edge_mask: jnp.ndarray,
        *,
        node_mask: Optional[jnp.ndarray] = None,
        graph_ids: Optional[jnp.ndarray] = None,
        num_graphs: int = 1,
    ) -> jnp.ndarray:
        n = z.shape[0]
        x = nn.Embed(self.max_z, self.hidden_channels)(z)
        dist = jnp.linalg.norm(pos[receivers] - pos[senders] + 1e-12, axis=-1)
        rbf = GaussianSmearing(0.0, self.cutoff, self.num_gaussians)(dist)
        for _ in range(self.num_interactions):
            x = InteractionBlock(
                self.hidden_channels, self.num_filters, self.cutoff
            )(x, senders, receivers, dist, rbf, edge_mask, n)
        x = shifted_softplus(nn.Dense(self.hidden_channels // 2)(x))
        x = nn.Dense(1)(x)[:, 0]
        if node_mask is not None:
            x = jnp.where(node_mask, x, 0)
        if graph_ids is None:
            return jnp.sum(x, keepdims=True)
        return segment_sum(x, graph_ids, num_graphs)
