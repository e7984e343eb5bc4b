"""GNNExplainer — reference ``torch_geometric/nn/models/gnn_explainer.py``.

Learns a soft edge mask and node-feature mask that preserve a model's
prediction while staying sparse/low-entropy.  TPU-native: the mask is just
an extra ``edge_weight`` input (static shapes; the reference instead patches
``MessagePassing.__edge_mask__`` globally), and the optimization loop is a
``lax.fori_loop`` — one jit, no per-step dispatch.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class ExplainerResult(NamedTuple):
    edge_mask: jnp.ndarray     # [E] in (0,1)
    feat_mask: jnp.ndarray     # [F] in (0,1)
    losses: jnp.ndarray        # [epochs]


DEFAULT_COEFFS = {
    "edge_size": 0.005,
    "edge_ent": 1.0,
    "feat_size": 1.0,
    "feat_ent": 0.1,
}


def explain(
    apply_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    target: jnp.ndarray,
    num_edges: int,
    *,
    node_idx: Optional[int] = None,
    epochs: int = 100,
    lr: float = 0.01,
    seed: int = 0,
    coeffs: dict = DEFAULT_COEFFS,
) -> ExplainerResult:
    """Optimize masks for ``apply_fn(x_masked, edge_mask) -> log_probs``.

    * graph-level explanation: ``target`` is the class id, ``node_idx`` None,
      ``apply_fn`` returns ``[num_classes]`` log-probs;
    * node-level: pass ``node_idx`` and an ``apply_fn`` returning
      ``[N, num_classes]``.
    """
    n, f = x.shape
    key = jax.random.key(seed)
    k1, k2 = jax.random.split(key)
    # reference init: N(0, 0.1) for feat, relu-gain-scaled for edges
    feat_logit0 = 0.1 * jax.random.normal(k1, (f,))
    std = jnp.sqrt(2.0 / (2 * n))
    edge_logit0 = std * jax.random.normal(k2, (num_edges,))

    tx = optax.adam(lr)

    def loss_fn(masks):
        edge_mask = jax.nn.sigmoid(masks["edge"])
        feat_mask = jax.nn.sigmoid(masks["feat"])
        logp = apply_fn(x * feat_mask[None, :], edge_mask)
        if node_idx is not None:
            logp = logp[node_idx]
        nll = -logp[target]
        m = edge_mask
        edge_size = coeffs["edge_size"] * jnp.sum(m)
        ent = -m * jnp.log(m + 1e-15) - (1 - m) * jnp.log(1 - m + 1e-15)
        edge_ent = coeffs["edge_ent"] * jnp.mean(ent)
        fm = feat_mask
        feat_size = coeffs["feat_size"] * jnp.mean(fm)
        fent = -fm * jnp.log(fm + 1e-15) - (1 - fm) * jnp.log(1 - fm + 1e-15)
        feat_ent = coeffs["feat_ent"] * jnp.mean(fent)
        return nll + edge_size + edge_ent + feat_size + feat_ent

    @jax.jit
    def run(masks, opt_state):
        def body(i, carry):
            masks, opt_state, losses = carry
            l, grads = jax.value_and_grad(loss_fn)(masks)
            updates, opt_state = tx.update(grads, opt_state, masks)
            masks = optax.apply_updates(masks, updates)
            losses = losses.at[i].set(l)
            return masks, opt_state, losses

        losses0 = jnp.zeros(epochs)
        return jax.lax.fori_loop(0, epochs, body, (masks, opt_state, losses0))

    masks = {"edge": edge_logit0, "feat": feat_logit0}
    masks, _, losses = run(masks, tx.init(masks))
    return ExplainerResult(
        edge_mask=jax.nn.sigmoid(masks["edge"]),
        feat_mask=jax.nn.sigmoid(masks["feat"]),
        losses=losses,
    )
