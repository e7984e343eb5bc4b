"""The flagship model: GCN reordering classifier.

Canonical architecture from the reference's *test-time* network
(``GCN_classifier/testgraph.py:50-84``; the train script's TopK call is a
known bug, SURVEY.md §3.6): two GraphConv(→128) layers with ReLU+dropout(0.2),
concat of both layers' activations, global max pool, concat with the 10
global extinfo features, then a 266→64→32→4 MLP with log-softmax.

Input: a padded :class:`Graph` batch whose node features are the Classorder
table ``[graph_id, row, out_deg, in_deg, elim_fill]`` (model consumes columns
2:5, reference ``graphclass.py:82``) and whose ``globals[:, :10]`` are the raw
extinfo stats (reference ``getexinfo``, ``graphclass.py:45-59``).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..data.graph import Graph
from ..nn.conv.graph_conv import GraphConv
from ..nn.glob.glob import global_max_pool, global_mean_pool


class ReorderClassifier(nn.Module):
    hidden: int = 128
    num_classes: int = 4
    num_node_features: int = 3
    num_global_features: int = 10
    dropout_rate: float = 0.2
    use_topk_pool: bool = False  # the (buggy) train-time variant, for parity
    readout: str = "max"  # "max" (reference) or "meanmax" (richer)
    log_exinfo: bool = True
    """Apply log1p to the raw extinfo stats.  The reference feeds raw counts
    (n up to ~1e4, nnz up to ~6e4) straight into lin1 (graphclass.py:44-59),
    which makes the first epochs diverge to NLL ~200 and costs thousands of
    epochs to recover; log-scaling is a pure-win conditioning fix.  Set False
    for strict reference parity."""

    @nn.compact
    def __call__(self, g: Graph, *, train: bool = False, ell_pair=None) -> jnp.ndarray:
        x = g.nodes[:, 2 : 2 + self.num_node_features]
        node_mask = g.node_mask()
        x = jnp.where(node_mask[:, None], x, 0)

        x1 = nn.relu(
            GraphConv(self.num_node_features, self.hidden, name="conv1")(
                x, g, ell_pair=ell_pair
            )
        )
        x1 = nn.Dropout(self.dropout_rate, deterministic=not train)(x1)
        x2 = nn.relu(
            GraphConv(self.hidden, self.hidden, name="conv2")(x1, g, ell_pair=ell_pair)
        )
        x2 = nn.Dropout(self.dropout_rate, deterministic=not train)(x2)

        h = jnp.concatenate([x1, x2], axis=-1)
        if self.readout == "meanmax":
            h = jnp.concatenate(
                [global_max_pool(h, g), global_mean_pool(h, g)], axis=-1
            )
        else:
            h = global_max_pool(h, g)  # [G_pad, 2·hidden]

        exinfo = g.globals[:, : self.num_global_features]
        if self.log_exinfo:
            exinfo = jnp.log1p(jnp.maximum(exinfo, 0))
        h = jnp.concatenate([h, exinfo], axis=-1)

        h = nn.relu(nn.Dense(64, name="lin1")(h))
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        h = nn.relu(nn.Dense(32, name="lin2")(h))
        logits = nn.Dense(self.num_classes, name="lin3")(h)
        return nn.log_softmax(logits)


class MLPBaseline(nn.Module):
    """The extinfo-only MLP-NN ablation (reference ``graphclass.py:75-94``
    commented variant; baseline val acc 0.53–0.57 per job_MLP_NN.log)."""

    num_classes: int = 4
    num_global_features: int = 10
    dropout_rate: float = 0.2
    log_exinfo: bool = True

    @nn.compact
    def __call__(self, g: Graph, *, train: bool = False) -> jnp.ndarray:
        h = g.globals[:, : self.num_global_features]
        if self.log_exinfo:
            h = jnp.log1p(jnp.maximum(h, 0))
        h = nn.relu(nn.Dense(64, name="lin1")(h))
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        h = nn.relu(nn.Dense(32, name="lin2")(h))
        return nn.log_softmax(nn.Dense(self.num_classes, name="lin3")(h))


def masked_nll_loss(log_probs: jnp.ndarray, g: Graph) -> jnp.ndarray:
    """Mean NLL over valid graphs (reference uses F.nll_loss over the batch,
    ``graphclass.py:118``)."""
    y = g.y.reshape(-1).astype(jnp.int32)
    mask = g.graph_mask().astype(log_probs.dtype)
    nll = -jnp.take_along_axis(log_probs, jnp.clip(y, 0)[:, None], axis=1)[:, 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


def masked_accuracy(log_probs: jnp.ndarray, g: Graph):
    """(correct, total) over valid graphs."""
    pred = jnp.argmax(log_probs, axis=-1)
    y = g.y.reshape(-1).astype(jnp.int32)
    mask = g.graph_mask()
    correct = jnp.sum((pred == y) & mask)
    return correct, jnp.sum(mask)


def fill_regret_loss(
    log_probs: jnp.ndarray, g: Graph, *, nll_weight: float = 1.0,
    regret_weight: float = 3.0,
) -> jnp.ndarray:
    """Cost-sensitive objective: NLL + expected log-fill-regret.

    ``globals[:, 10:14]`` holds the per-method symbolic fills
    (``tools/compute_fills.py``); the expected regret term
    ``Σ_k p_k · log(fill_k / fill_best)`` directly optimizes the metric the
    downstream QR pipeline cares about (the paper's −20.78 %-vs-COLAMD
    claim), instead of treating all misclassifications as equally bad.
    Graphs without fills (zeros) contribute the NLL term only.
    """
    nll = masked_nll_loss(log_probs, g)
    fills = g.globals[:, 10:14]
    has = jnp.all(fills > 0, axis=1)
    safe = jnp.maximum(fills, 1.0)
    best = jnp.min(safe, axis=1, keepdims=True)
    regret = jnp.log(safe / best)                      # [G, 4], 0 at the best
    p = jnp.exp(log_probs)
    exp_regret = jnp.sum(p * regret, axis=1)
    mask = g.graph_mask() & has
    m = mask.astype(log_probs.dtype)
    reg = jnp.sum(exp_regret * m) / jnp.maximum(jnp.sum(m), 1)
    return nll_weight * nll + regret_weight * reg


def soft_regret_loss(
    log_probs: jnp.ndarray, g: Graph, *, tau: float = 0.05,
    regret_weight: float = 3.0,
) -> jnp.ndarray:
    """Soft-target objective for the near-tie label structure.

    The argmax labels are arbitrary when two orderings fill within a few %
    (diagnosed on the 5-seed flagship sweep: seeds differ most on graphs
    whose top-2 fills are near-equal), so instead of one-hot NLL the
    cross-entropy target is ``softmax(−regret/τ)`` over the measured
    per-method log-fill regrets — a graph with a clear winner still gets an
    (almost) one-hot target, a near-tie distributes mass over the tied
    orderings and stops whipsawing the model between seeds.  The expected-
    regret term of :func:`fill_regret_loss` is kept (it optimizes the
    deployment metric directly).  Graphs without fills fall back to hard
    NLL.
    """
    y = g.y.reshape(-1).astype(jnp.int32)
    gmask = g.graph_mask()
    fills = g.globals[:, 10:14]
    has = jnp.all(fills > 0, axis=1)
    safe = jnp.maximum(fills, 1.0)
    best = jnp.min(safe, axis=1, keepdims=True)
    regret = jnp.log(safe / best)                      # [G, 4], 0 at the best
    soft = jax.nn.softmax(-regret / tau, axis=1)
    onehot = jax.nn.one_hot(jnp.clip(y, 0), log_probs.shape[1],
                            dtype=log_probs.dtype)
    target = jnp.where(has[:, None], soft, onehot)
    ce = -jnp.sum(target * log_probs, axis=1)
    m = gmask.astype(log_probs.dtype)
    loss = jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1)
    p = jnp.exp(log_probs)
    exp_regret = jnp.sum(p * regret, axis=1)
    mr = (gmask & has).astype(log_probs.dtype)
    reg = jnp.sum(exp_regret * mr) / jnp.maximum(jnp.sum(mr), 1)
    return loss + regret_weight * reg
