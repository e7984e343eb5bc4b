"""TemporalData — reference ``torch_geometric/data/temporal.py:7-119``.

Event-stream container (src, dst, t, msg, y) for temporal models (TGN,
RENet): numpy-backed, sliceable by int/slice/index-array/bool-mask, with the
reference's time-quantile ``train_val_test_split`` and sequential
``seq_batches``.  Host-side (data prep); device code consumes fixed-shape
batches built from the slices.
"""
from __future__ import annotations

from typing import Iterator, Optional

import numpy as np


class TemporalData:
    """Event-stream container ``(src, dst, t, msg)`` for temporal GNNs (reference ``data/temporal.py:TemporalData``)."""
    def __init__(self, src=None, dst=None, t=None, msg=None, y=None, **kwargs):
        self.src = None if src is None else np.asarray(src)
        self.dst = None if dst is None else np.asarray(dst)
        self.t = None if t is None else np.asarray(t)
        self.msg = None if msg is None else np.asarray(msg)
        self.y = None if y is None else np.asarray(y)
        for key, item in kwargs.items():
            setattr(self, key, np.asarray(item))

    @property
    def keys(self):
        return [k for k, v in self.__dict__.items() if v is not None]

    def __iter__(self):
        for key in sorted(self.keys):
            yield key, getattr(self, key)

    def __contains__(self, key):
        return key in self.keys

    @property
    def num_events(self) -> int:
        return 0 if self.src is None else len(self.src)

    @property
    def num_nodes(self) -> int:
        return int(max(self.src.max(), self.dst.max())) + 1

    def __getitem__(self, idx):
        if isinstance(idx, str):
            return getattr(self, idx, None)
        if isinstance(idx, int):
            idx = np.asarray([idx])
        elif isinstance(idx, (list, tuple)):
            idx = np.asarray(idx)
        out = TemporalData()
        for key, item in self:
            if item.shape[0] == self.num_events:
                setattr(out, key, item[idx])
            else:
                setattr(out, key, item)
        return out

    def train_val_test_split(self, val_ratio: float = 0.15,
                             test_ratio: float = 0.15):
        """Chronological split at the (1−v−t) and (1−t) time quantiles
        (reference ``temporal.py:95-103``)."""
        val_time, test_time = np.quantile(
            self.t, [1.0 - val_ratio - test_ratio, 1.0 - test_ratio])
        val_idx = int((self.t <= val_time).sum())
        test_idx = int((self.t <= test_time).sum())
        return self[slice(0, val_idx)], self[slice(val_idx, test_idx)], \
            self[slice(test_idx, self.num_events)]

    def seq_batches(self, batch_size: int) -> Iterator["TemporalData"]:
        for start in range(0, self.num_events, batch_size):
            yield self[slice(start, start + batch_size)]

    def __repr__(self):
        shapes = ", ".join(f"{k}={list(v.shape)}" for k, v in self)
        return f"{self.__class__.__name__}({shapes})"
