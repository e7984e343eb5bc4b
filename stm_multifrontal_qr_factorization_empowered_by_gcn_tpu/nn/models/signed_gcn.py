"""SignedGCN — reference ``torch_geometric/nn/models/signed_gcn.py`` (Derr et
al., "Signed Graph Convolutional Network", 2018). Stacks
:class:`~..conv.SignedConv` layers over positive/negative edge sets, with the
reference's full objective: 3-way link discrimination NLL + balance-theory
triplet losses, spectral input features from a truncated SVD of the signed
adjacency, and AUC/F1 evaluation.

TPU-native notes: the forward/losses are pure jittable functions of static-
shape edge arrays (pad + mask like the rest of the framework); the "none"
edges for the NLL use the on-device uniform sampler (collisions with real
edges are vanishingly rare on sparse graphs — same choice as GAE here).
Spectral features and edge splitting are host-side data prep, as in the
reference (scipy's sparse SVD replaces sklearn's TruncatedSVD).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..conv.relational import SignedConv


def split_edges(
    edge_index: np.ndarray, test_ratio: float = 0.2, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Random train/test edge split (reference ``split_edges``)."""
    e = edge_index.shape[1]
    rng = np.random.default_rng(seed)
    mask = np.ones(e, bool)
    mask[rng.permutation(e)[: int(test_ratio * e)]] = False
    return edge_index[:, mask], edge_index[:, ~mask]


def create_spectral_features(
    pos_edge_index: np.ndarray,
    neg_edge_index: np.ndarray,
    num_nodes: int,
    dim: int,
) -> np.ndarray:
    """Truncated SVD of the symmetrized signed adjacency (+1/−1), the
    reference's input featurization (``signed_gcn.py:73-108``)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    ei = np.concatenate([pos_edge_index, neg_edge_index], axis=1)
    val = np.concatenate(
        [np.ones(pos_edge_index.shape[1]), -np.ones(neg_edge_index.shape[1])]
    )
    ei = np.concatenate([ei, ei[::-1]], axis=1)
    val = np.concatenate([val, val])
    a = sp.coo_matrix((val, (ei[0], ei[1])), shape=(num_nodes, num_nodes)).tocsr()
    a.sum_duplicates()
    k = min(dim, min(a.shape) - 1)
    _, _, vt = spla.svds(
        a.astype(np.float64), k=k, random_state=np.random.default_rng(0)
    )
    x = np.zeros((num_nodes, dim), np.float32)
    x[:, :k] = vt.T.astype(np.float32)
    return x


class SignedGCN(nn.Module):
    in_channels: int
    hidden_channels: int
    num_layers: int
    lamb: float = 5.0
    use_bias: bool = True

    def setup(self):
        h = self.hidden_channels // 2
        self.conv1 = SignedConv(self.in_channels, h, first_aggr=True,
                                use_bias=self.use_bias)
        self.convs = [
            SignedConv(h, h, first_aggr=False, use_bias=self.use_bias)
            for _ in range(self.num_layers - 1)
        ]
        self.lin = nn.Dense(3)

    def __call__(
        self,
        x: jnp.ndarray,
        pos_edges: Tuple[jnp.ndarray, jnp.ndarray],
        neg_edges: Tuple[jnp.ndarray, jnp.ndarray],
        *,
        pos_mask: Optional[jnp.ndarray] = None,
        neg_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        z = jax.nn.relu(
            self.conv1(x, pos_edges, neg_edges, pos_mask=pos_mask, neg_mask=neg_mask)
        )
        for conv in self.convs:
            z = jax.nn.relu(
                conv(z, pos_edges, neg_edges, pos_mask=pos_mask, neg_mask=neg_mask)
            )
        return z

    def init_all(self, x, pos_edges, neg_edges) -> jnp.ndarray:
        """Init entry point touching every parameter (the discriminator
        ``lin`` is otherwise unused by ``__call__``):
        ``model.init(key, x, pe, ne, method=SignedGCN.init_all)``."""
        z = self(x, pos_edges, neg_edges)
        self.discriminate(z, pos_edges)
        return z

    def discriminate(self, z: jnp.ndarray, edges) -> jnp.ndarray:
        """[E, 3] log-probs of (positive, negative, none) link classes."""
        s, r = edges
        val = jnp.concatenate([z[s], z[r]], axis=-1)
        return jax.nn.log_softmax(self.lin(val), axis=-1)

    def nll_loss(self, key, z, pos_edges, neg_edges) -> jnp.ndarray:
        from ...utils.random_graphs import negative_sampling_on_device

        n = z.shape[0]
        e = pos_edges[0].shape[0] + neg_edges[0].shape[0]
        none_edges = negative_sampling_on_device(key, n, e)
        loss = 0.0
        for edges, cls in ((pos_edges, 0), (neg_edges, 1), (none_edges, 2)):
            lp = self.discriminate(z, edges)
            loss = loss - jnp.mean(lp[:, cls])
        return loss / 3.0

    def _triplet(self, key, z, edges, swap: bool) -> jnp.ndarray:
        """Structured negative sampling triplet loss: for each edge (i, j)
        draw a uniform k; hinge on d(i,j) − d(i,k) (or swapped for the
        negative-edge loss)."""
        i, j = edges
        k = jax.random.randint(key, i.shape, 0, z.shape[0])
        d_ij = jnp.sum((z[i] - z[j]) ** 2, axis=1)
        d_ik = jnp.sum((z[i] - z[k]) ** 2, axis=1)
        out = (d_ik - d_ij) if swap else (d_ij - d_ik)
        return jnp.mean(jnp.maximum(out, 0))

    def loss(self, key, z, pos_edges, neg_edges) -> jnp.ndarray:
        """Overall objective (reference ``signed_gcn.py:188-199``)."""
        k1, k2, k3 = jax.random.split(key, 3)
        nll = self.nll_loss(k1, z, pos_edges, neg_edges)
        l1 = self._triplet(k2, z, pos_edges, swap=False)
        l2 = self._triplet(k3, z, neg_edges, swap=True)
        return nll + self.lamb * (l1 + l2)


def signed_gcn_test(
    model: SignedGCN, variables, z, pos_edge_index, neg_edge_index
) -> Tuple[float, float]:
    """AUC + binary F1 of pos-vs-neg link prediction (reference ``test``;
    sklearn-free NumPy implementations)."""
    def pred_pos(edges):
        lp = model.apply(variables, z, edges, method=SignedGCN.discriminate)
        return np.asarray(jnp.argmax(lp[:, :2], axis=1))

    pos_p = 1 - pred_pos((jnp.asarray(pos_edge_index[0]), jnp.asarray(pos_edge_index[1])))
    neg_p = 1 - pred_pos((jnp.asarray(neg_edge_index[0]), jnp.asarray(neg_edge_index[1])))
    pred = np.concatenate([pos_p, neg_p]).astype(np.float64)
    y = np.concatenate([np.ones_like(pos_p), np.zeros_like(neg_p)]).astype(np.float64)

    # ROC-AUC via the rank statistic (exact for binary scores with ties)
    order = np.argsort(pred)
    ranks = np.empty_like(order, np.float64)
    ranks[order] = np.arange(1, len(pred) + 1)
    # average ranks over ties
    for v in np.unique(pred):
        m = pred == v
        ranks[m] = ranks[m].mean()
    n_pos, n_neg = y.sum(), (1 - y).sum()
    auc = (ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2) / max(n_pos * n_neg, 1)

    tp = float(((pred == 1) & (y == 1)).sum())
    fp = float(((pred == 1) & (y == 0)).sum())
    fn = float(((pred == 0) & (y == 1)).sum())
    f1 = 2 * tp / max(2 * tp + fp + fn, 1e-12) if pred.sum() > 0 else 0.0
    return float(auc), float(f1)
