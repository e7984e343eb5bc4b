"""RENet — Recurrent Event Network for temporal knowledge graphs.

Reference ``torch_geometric/nn/models/re_net.py:9-208`` (Jin et al. 2019):
entity/relation embeddings, per-timestep mean aggregation of the objects a
subject interacted with under a relation, a GRU over the ``seq_len`` past
steps, and linear heads predicting the next object (given s, r) and subject
(given o, r).

TPU redesign: the reference scatters variable-length histories; here
histories arrive as FIXED-SIZE arrays plus a validity mask (padding-safe
``segment_mean``), so one jitted program serves every batch.  The GRU is a
``flax.linen.RNN`` scan.  ``pre_transform`` (host-side, data prep) and
``test`` (MRR / Hits@k) mirror the reference API.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.segment import segment_mean


class EventBatch(NamedTuple):
    """One batch of (s, r, o) events with fixed-size histories.

    ``h_sub``/``h_obj``: [H] node ids seen in the subject's / object's past
    under the event's relation; ``*_t`` their relative timestep in
    ``[0, seq_len)``; ``*_batch`` the event each entry belongs to;
    ``*_mask`` validity (False = padding).
    """

    sub: jnp.ndarray          # [B]
    rel: jnp.ndarray          # [B]
    obj: jnp.ndarray          # [B]
    h_sub: jnp.ndarray        # [H]
    h_sub_t: jnp.ndarray      # [H]
    h_sub_batch: jnp.ndarray  # [H]
    h_sub_mask: jnp.ndarray   # [H] bool
    h_obj: jnp.ndarray
    h_obj_t: jnp.ndarray
    h_obj_batch: jnp.ndarray
    h_obj_mask: jnp.ndarray


class RENet(nn.Module):
    num_nodes: int
    num_rels: int
    hidden_channels: int
    seq_len: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, data: EventBatch, *, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        C, L = self.hidden_channels, self.seq_len
        B = data.sub.shape[0]
        xavier = nn.initializers.xavier_uniform()
        ent = self.param("ent", xavier, (self.num_nodes, C))
        rel = self.param("rel", xavier, (self.num_rels, C))

        def hist_seq(h, t, b, mask):
            idx = t + b * L
            agg = segment_mean(ent[h], idx, B * L, mask=mask)
            return agg.reshape(B, L, C)

        h_sub = hist_seq(data.h_sub, data.h_sub_t, data.h_sub_batch,
                         data.h_sub_mask)
        h_obj = hist_seq(data.h_obj, data.h_obj_t, data.h_obj_batch,
                         data.h_obj_mask)

        e_sub = ent[data.sub]
        e_obj = ent[data.obj]
        e_rel = rel[data.rel]
        tile = lambda e: jnp.broadcast_to(e[:, None, :], (B, L, C))

        sub_in = jnp.concatenate([tile(e_sub), h_sub, tile(e_rel)], axis=-1)
        obj_in = jnp.concatenate([tile(e_obj), h_obj, tile(e_rel)], axis=-1)

        carry_s, _ = nn.RNN(nn.GRUCell(C), return_carry=True,
                            name="sub_gru")(sub_in)
        carry_o, _ = nn.RNN(nn.GRUCell(C), return_carry=True,
                            name="obj_gru")(obj_in)

        z_sub = jnp.concatenate([e_sub, carry_s, e_rel], axis=-1)
        z_obj = jnp.concatenate([e_obj, carry_o, e_rel], axis=-1)
        z_sub = nn.Dropout(self.dropout, deterministic=not train)(z_sub)
        z_obj = nn.Dropout(self.dropout, deterministic=not train)(z_obj)

        log_prob_obj = jax.nn.log_softmax(
            nn.Dense(self.num_nodes, name="sub_lin")(z_sub))
        log_prob_sub = jax.nn.log_softmax(
            nn.Dense(self.num_nodes, name="obj_lin")(z_obj))
        return log_prob_obj, log_prob_sub

    @staticmethod
    def pre_transform(seq_len: int):
        """Host-side history builder over a time-ordered event stream —
        reference ``re_net.py:77-144``.  Call with dicts
        ``{"sub", "rel", "obj", "t"}``; returns the dict extended with
        ``h_sub``/``h_sub_t`` and ``h_obj``/``h_obj_t`` (variable length;
        see :func:`collate_events` for the fixed-shape batch)."""

        class PreTransform:
            def __init__(self):
                self.t_last = None
                self.sub_hist = {}
                self.obj_hist = {}

            def _get(self, hist, node, r):
                slots = hist.get(node, [[] for _ in range(seq_len)])
                nodes, ts = [], []
                for sstep, h in enumerate(slots):
                    for other, hr in h:
                        if hr == r:
                            nodes.append(other)
                            ts.append(sstep)
                return np.asarray(nodes, np.int64), np.asarray(ts, np.int64)

            def _step(self, hist):
                for k in hist:
                    hist[k] = hist[k][1:] + [[]]

            def __call__(self, data: dict) -> dict:
                s, r, o, t = data["sub"], data["rel"], data["obj"], data["t"]
                if self.t_last is None:
                    self.t_last = t
                if t > self.t_last:
                    self._step(self.sub_hist)
                    self._step(self.obj_hist)
                    self.t_last = t
                data = dict(data)
                data["h_sub"], data["h_sub_t"] = self._get(self.sub_hist, s, r)
                data["h_obj"], data["h_obj_t"] = self._get(self.obj_hist, o, r)
                self.sub_hist.setdefault(
                    s, [[] for _ in range(seq_len)])[-1].append((o, r))
                self.obj_hist.setdefault(
                    o, [[] for _ in range(seq_len)])[-1].append((s, r))
                return data

        return PreTransform()

    @staticmethod
    def test(logits, y) -> np.ndarray:
        """MRR and Hits@1/3/10 — reference ``re_net.py:197-208``."""
        logits = np.asarray(logits)
        y = np.asarray(y).reshape(-1)
        order = np.argsort(-logits, axis=1)
        rank = np.argmax(order == y[:, None], axis=1) + 1
        return np.asarray([
            float((1.0 / rank).mean()),
            float((rank <= 1).mean()),
            float((rank <= 3).mean()),
            float((rank <= 10).mean()),
        ])


def collate_events(events, seq_len: int, pad_hist: int) -> EventBatch:
    """Batch pre-transformed events into fixed-shape arrays (the padding
    analog of the reference's ragged ``h_sub_batch`` collation)."""
    B = len(events)

    def side(key):
        h, t, b = [], [], []
        for i, ev in enumerate(events):
            h += list(ev[key]); t += list(ev[key + "_t"])
            b += [i] * len(ev[key])
        h, t, b = (np.asarray(a, np.int64) for a in (h, t, b))
        if len(h) > pad_hist:
            h, t, b = h[:pad_hist], t[:pad_hist], b[:pad_hist]
        mask = np.zeros(pad_hist, bool); mask[: len(h)] = True
        pad = pad_hist - len(h)
        return (np.concatenate([h, np.zeros(pad, np.int64)]),
                np.concatenate([t, np.zeros(pad, np.int64)]),
                np.concatenate([b, np.zeros(pad, np.int64)]), mask)

    hs, hst, hsb, hsm = side("h_sub")
    ho, hot, hob, hom = side("h_obj")
    return EventBatch(
        sub=jnp.asarray([e["sub"] for e in events]),
        rel=jnp.asarray([e["rel"] for e in events]),
        obj=jnp.asarray([e["obj"] for e in events]),
        h_sub=jnp.asarray(hs), h_sub_t=jnp.asarray(hst),
        h_sub_batch=jnp.asarray(hsb), h_sub_mask=jnp.asarray(hsm),
        h_obj=jnp.asarray(ho), h_obj_t=jnp.asarray(hot),
        h_obj_batch=jnp.asarray(hob), h_obj_mask=jnp.asarray(hom),
    )
