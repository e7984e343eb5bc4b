"""Temporal Graph Network memory — reference
``torch_geometric/nn/models/tgn.py`` (Rossi et al., "Temporal Graph Networks
for Deep Learning on Dynamic Graphs", 2020).

The reference is a stateful ``nn.Module`` holding buffers (``memory``,
``last_update``) and Python-dict message stores that defer each batch's
events until the *next* memory access (train-time leakage protection).
JAX-native redesign: all of that state is an explicit **pytree**
(:class:`TGNState`) threaded functionally through :func:`TGNMemory.forward`
/ :func:`TGNMemory.update_state` — the same pattern optax uses for optimizer
state — with a static event budget per batch so everything jits:

* ``pending_*`` arrays hold the last batch's events in both directions
  (src→dst and dst→src), masked by ``pending_mask`` — the static-shape
  replacement of ``msg_s_store``/``msg_d_store``;
* ``forward(state, n_id)`` returns memory *with pending applied* (training
  semantics of ``__get_updated_memory__``) without committing it;
* ``update_state`` commits the pending events through the message →
  aggregate (last/mean) → GRU pipeline, then stores the new batch.

The ``LastNeighborLoader`` (a host-side rolling most-recent-neighbor table,
``tgn.py:211-281``) is reimplemented in NumPy — it is a data-loading
structure, not device compute.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class TGNState(NamedTuple):
    memory: jnp.ndarray        # [N, memory_dim]
    last_update: jnp.ndarray   # [N] int32
    pending_src: jnp.ndarray   # [P] int32 (both directions concatenated)
    pending_dst: jnp.ndarray   # [P] int32
    pending_t: jnp.ndarray     # [P] int32
    pending_raw: jnp.ndarray   # [P, raw_msg_dim]
    pending_mask: jnp.ndarray  # [P] bool


class TimeEncoder(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        return jnp.cos(nn.Dense(self.out_channels)(t[:, None].astype(jnp.float32)))


def identity_message(z_src, z_dst, raw_msg, t_enc):
    """Reference ``IdentityMessage``."""
    return jnp.concatenate([z_src, z_dst, raw_msg, t_enc], axis=-1)


def last_aggregate(msg, index, t, mask, dim_size):
    """Keep each destination's most recent message (reference
    ``LastAggregator``): two-pass segment argmax — max t per segment, then
    max event id among entries attaining it (int32-safe, no packing)."""
    neg = jnp.iinfo(jnp.int32).min
    key = jnp.where(mask, t, neg)
    mt = jax.ops.segment_max(key, index, dim_size)
    is_best = mask & (key == mt[index])
    eids = jnp.where(is_best, jnp.arange(msg.shape[0], dtype=jnp.int32), -1)
    best_eid = jax.ops.segment_max(eids, index, dim_size)
    has = best_eid >= 0
    return jnp.where(has[:, None], msg[jnp.clip(best_eid, 0)], 0)


def mean_aggregate(msg, index, t, mask, dim_size):
    m = jnp.where(mask[:, None], msg, 0)
    s = jax.ops.segment_sum(m, index, dim_size)
    c = jax.ops.segment_sum(mask.astype(msg.dtype), index, dim_size)
    return s / jnp.maximum(c, 1)[:, None]


_AGGRS = {"last": last_aggregate, "mean": mean_aggregate}


class TGNMemory(nn.Module):
    num_nodes: int
    raw_msg_dim: int
    memory_dim: int
    time_dim: int
    aggregator: str = "last"

    def setup(self):
        self.time_enc = TimeEncoder(self.time_dim)
        # src-direction and dst-direction message MLP roles: the reference
        # uses IdentityMessage (concat) by default; the GRU consumes it
        self.gru = nn.GRUCell(features=self.memory_dim)

    def init_state(self, max_events: int) -> TGNState:
        """Fresh state with a static two-direction event budget
        (``max_events`` = 2 x the largest batch's event count)."""
        return TGNState(
            memory=jnp.zeros((self.num_nodes, self.memory_dim)),
            last_update=jnp.zeros(self.num_nodes, jnp.int32),
            pending_src=jnp.zeros(max_events, jnp.int32),
            pending_dst=jnp.zeros(max_events, jnp.int32),
            pending_t=jnp.zeros(max_events, jnp.int32),
            pending_raw=jnp.zeros((max_events, self.raw_msg_dim)),
            pending_mask=jnp.zeros(max_events, bool),
        )

    def _apply_pending(self, state: TGNState) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Memory + last_update with the stored batch applied
        (``__get_updated_memory__``)."""
        s, d, t = state.pending_src, state.pending_dst, state.pending_t
        mask = state.pending_mask
        t_rel = t - state.last_update[s]
        t_enc = self.time_enc(jnp.where(mask, t_rel, 0))
        msg = identity_message(
            state.memory[s], state.memory[d], state.pending_raw, t_enc
        )
        aggr = _AGGRS[self.aggregator](msg, s, t, mask, self.num_nodes)
        touched = (
            jnp.zeros(self.num_nodes, bool)
            .at[jnp.where(mask, s, 0)]
            .max(mask)
        )
        new_mem, _ = self.gru(state.memory, aggr)
        memory = jnp.where(touched[:, None], new_mem, state.memory)
        lu = state.last_update.at[jnp.where(mask, s, 0)].max(
            jnp.where(mask, t, 0)
        )
        return memory, lu

    def __call__(self, state: TGNState, n_id: jnp.ndarray):
        """(memory[n_id], last_update[n_id]) with pending events applied —
        the reference's train-mode ``forward``."""
        memory, lu = self._apply_pending(state)
        return memory[n_id], lu[n_id]

    def update_state(
        self,
        state: TGNState,
        src: jnp.ndarray,
        dst: jnp.ndarray,
        t: jnp.ndarray,
        raw_msg: jnp.ndarray,
        mask: jnp.ndarray = None,
    ) -> TGNState:
        """Commit pending events to memory, then store this batch (both
        directions) as the new pending set (train-mode ``update_state``)."""
        if mask is None:
            mask = jnp.ones(src.shape[0], bool)
        memory, lu = self._apply_pending(state)
        p = state.pending_src.shape[0]
        e2 = 2 * src.shape[0]
        if e2 > p:
            raise ValueError(f"event budget {p} < 2*batch ({e2})")
        pad = p - e2

        def cat(a, b, fill):
            both = jnp.concatenate([a, b])
            return jnp.concatenate(
                [both, jnp.full((pad,) + both.shape[1:], fill, both.dtype)]
            )

        return TGNState(
            memory=memory,
            last_update=lu,
            pending_src=cat(src, dst, 0),
            pending_dst=cat(dst, src, 0),
            pending_t=cat(t, t, 0),
            pending_raw=cat(raw_msg, raw_msg, 0),
            pending_mask=cat(mask, mask, False),
        )

    def flush(self, state: TGNState) -> TGNState:
        """Apply pending and clear (reference ``train(False)`` flush)."""
        memory, lu = self._apply_pending(state)
        return state._replace(
            memory=memory,
            last_update=lu,
            pending_mask=jnp.zeros_like(state.pending_mask),
        )


class LastNeighborLoader:
    """Rolling most-recent-neighbor table (host side, NumPy) — reference
    ``LastNeighborLoader``: keeps the ``size`` most recent undirected
    interactions per node, returns relabeled subgraphs."""

    def __init__(self, num_nodes: int, size: int):
        self.size = size
        self.num_nodes = num_nodes
        self.reset_state()

    def reset_state(self):
        self.cur_e_id = 0
        self.neighbors = np.zeros((self.num_nodes, self.size), np.int64)
        self.e_id = np.full((self.num_nodes, self.size), -1, np.int64)

    def __call__(self, n_id: np.ndarray):
        n_id = np.asarray(n_id)
        neighbors = self.neighbors[n_id]
        nodes = np.repeat(n_id[:, None], self.size, 1)
        e_id = self.e_id[n_id]
        m = e_id >= 0
        neighbors, nodes, e_id = neighbors[m], nodes[m], e_id[m]
        full = np.unique(np.concatenate([n_id, neighbors]))
        assoc = {v: i for i, v in enumerate(full)}
        rel = np.vectorize(assoc.get, otypes=[np.int64])
        ei = (
            np.stack([rel(neighbors), rel(nodes)])
            if len(neighbors)
            else np.zeros((2, 0), np.int64)
        )
        return full, ei, e_id

    def insert(self, src: np.ndarray, dst: np.ndarray):
        src, dst = np.asarray(src), np.asarray(dst)
        nodes = np.concatenate([dst, src])
        nbrs = np.concatenate([src, dst])
        eids = np.arange(self.cur_e_id, self.cur_e_id + len(src))
        eids = np.concatenate([eids, eids])
        self.cur_e_id += len(src)
        for v in np.unique(nodes):
            m = nodes == v
            cand_e = np.concatenate([self.e_id[v], eids[m]])
            cand_n = np.concatenate([self.neighbors[v], nbrs[m]])
            top = np.argsort(-cand_e, kind="stable")[: self.size]
            self.e_id[v], self.neighbors[v] = cand_e[top], cand_n[top]
