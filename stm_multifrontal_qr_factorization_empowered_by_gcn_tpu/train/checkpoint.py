"""Checkpoint utilities — dependency-free msgpack pytree snapshots.

Upgrades over the reference's whole-``torch.save`` pickles
(``graphclass.py:180-181``; SURVEY.md §5 checkpoint row): optimizer state and
step counters are saved too, files are framework-independent bytes, and
atomic-rename writes survive interruption."""
from __future__ import annotations

import os
import os.path as osp
from typing import Any, Optional

import flax.serialization
import jax


def save_checkpoint(path: str, state: Any) -> None:
    """Atomically write a pytree (params / opt_state / counters / rngs)."""
    state = jax.device_get(state)
    d = osp.dirname(osp.abspath(path))
    os.makedirs(d, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.to_bytes(state))
    os.replace(tmp, path)


def load_checkpoint(path: str, template: Any) -> Any:
    """Read a pytree written by :func:`save_checkpoint`; ``template`` supplies
    the tree structure (e.g. a freshly-initialized state)."""
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())


def latest_checkpoint(ckpt_dir: str, prefix: str = "") -> Optional[str]:
    """Path of the newest checkpoint under ``ckpt_dir`` matching ``prefix``, or None."""
    if not osp.isdir(ckpt_dir):
        return None
    cands = [
        osp.join(ckpt_dir, f)
        for f in os.listdir(ckpt_dir)
        if f.startswith(prefix) and f.endswith(".msgpack")
    ]
    return max(cands, key=osp.getmtime) if cands else None
