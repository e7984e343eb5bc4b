"""Debug flag + typing aliases + phase profiler.

Reference: ``torch_geometric/debug.py:1-53`` (global debug flag),
``torch_geometric/typing.py:1-12`` (type aliases), and the C side's
``-DPRINT_TIME`` phase timers (``SparseQR.c:339-356`` → ``Results/
QR_Time.txt``; SURVEY.md §5 tracing row).
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp

# ---- typing aliases (reference typing.py) ---------------------------------
Adj = Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]
OptArray = Optional[jnp.ndarray]
PairArray = Tuple[jnp.ndarray, OptArray]

# ---- debug flag (reference debug.py) --------------------------------------
__debug_flag__ = {"enabled": False}


def is_debug_enabled() -> bool:
    """True while a ``debug()`` context is active (reference ``torch_geometric/debug.py``)."""
    return __debug_flag__["enabled"]


def set_debug(on: bool) -> None:
    """Globally enable/disable debug mode outside a context manager."""
    __debug_flag__["enabled"] = on


class debug:
    """``with debug(): ...`` context (reference ``debug.py:27-41``)."""

    def __enter__(self):
        self.prev = is_debug_enabled()
        set_debug(True)

    def __exit__(self, *a):
        set_debug(self.prev)


# ---- phase timer (reference -DPRINT_TIME capability) ----------------------
class PhaseTimer:
    """Named phase timers with a ``report()`` table; blocks on device work so
    numbers mean what they say (``block_until_ready`` inside the scope)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, *sync_on):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            for v in sync_on:
                jax.block_until_ready(v)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = [f"{'phase':20s} {'total_s':>10s} {'calls':>7s} {'avg_ms':>9s}"]
        for k in sorted(self.totals, key=self.totals.get, reverse=True):
            t, c = self.totals[k], self.counts[k]
            lines.append(f"{k:20s} {t:10.3f} {c:7d} {t / c * 1e3:9.2f}")
        return "\n".join(lines)


def trace_annotated(name: str):
    """Decorator adding an XLA/profiler trace annotation around a function
    (shows up in ``jax.profiler`` traces — the structured-tracing upgrade
    over the reference's printf timers)."""

    def deco(fn):
        def wrapped(*args, **kwargs):
            with jax.profiler.TraceAnnotation(name):
                return fn(*args, **kwargs)

        wrapped.__name__ = getattr(fn, "__name__", name)
        return wrapped

    return deco
