"""Training loop utilities: jit'd steps, checkpointing, accuracy eval.

Replaces the reference's ad-hoc script loops (``graphclass.py:104-200``) with
a reusable trainer.  Checkpoints serialize the full (params, opt_state, step)
pytree with flax msgpack — unlike the reference's whole-``torch.save`` model
pickles, these are dependency-free and resumable (including optimizer state,
which the reference never saved; SURVEY.md §5 checkpoint row).
"""
from __future__ import annotations

import os
import os.path as osp
from functools import partial
from typing import Any, Callable, Iterable, Optional, Tuple

import flax.serialization
import jax
import jax.numpy as jnp
import optax

from ..data.graph import Graph
from ..models.reorder_classifier import masked_accuracy, masked_nll_loss


class Trainer:
    """Reference-shaped host epoch loop (Adam + NLL, eval cadence, checkpointing) over jitted train/eval steps — the ``graphclass.py:104-200`` flow as a reusable class."""
    def __init__(
        self,
        model,
        *,
        learning_rate: float = 1e-4,
        loss_fn: Callable = masked_nll_loss,
        seed: int = 0,
    ):
        self.model = model
        self.tx = optax.adam(learning_rate)
        self.loss_fn = loss_fn
        self.seed = seed
        self.params = None
        self.opt_state = None
        self.step_count = 0
        self._dropout_key = jax.random.key(seed + 1)

        @jax.jit
        def _train_step(params, opt_state, g: Graph, dropout_key):
            def loss(p):
                logp = self.model.apply(
                    p, g, train=True, rngs={"dropout": dropout_key}
                )
                return self.loss_fn(logp, g)

            loss_val, grads = jax.value_and_grad(loss)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss_val

        @jax.jit
        def _eval_step(params, g: Graph):
            logp = self.model.apply(params, g, train=False)
            return masked_accuracy(logp, g)

        self._train_step = _train_step
        self._eval_step = _eval_step

    # ------------------------------------------------------------------
    def init(self, example: Graph):
        self.params = self.model.init(jax.random.key(self.seed), example)
        self.opt_state = self.tx.init(self.params)
        return self

    def train_epoch(self, loader: Iterable[Graph]) -> float:
        total, denom = 0.0, 0
        for batch in loader:
            g = jax.tree_util.tree_map(jnp.asarray, batch)
            self._dropout_key, sub = jax.random.split(self._dropout_key)
            self.params, self.opt_state, loss = self._train_step(
                self.params, self.opt_state, g, sub
            )
            n = int(jnp.sum(g.graph_mask()))
            total += float(loss) * n
            denom += n
            self.step_count += 1
        return total / max(denom, 1)

    def evaluate(self, loader: Iterable[Graph]) -> Tuple[int, int]:
        correct = total = 0
        for batch in loader:
            g = jax.tree_util.tree_map(jnp.asarray, batch)
            c, t = self._eval_step(self.params, g)
            correct += int(c)
            total += int(t)
        return correct, total

    # ------------------------------------------------------------------
    def save(self, path: str):
        os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
        state = {
            "params": self.params,
            "opt_state": self.opt_state,
            "step": self.step_count,
        }
        with open(path, "wb") as f:
            f.write(flax.serialization.to_bytes(state))

    def restore(self, path: str, example: Optional[Graph] = None):
        if self.params is None:
            if example is None:
                raise ValueError("call init(example) or pass example to restore()")
            self.init(example)
        with open(path, "rb") as f:
            state = flax.serialization.from_bytes(
                {
                    "params": self.params,
                    "opt_state": self.opt_state,
                    "step": self.step_count,
                },
                f.read(),
            )
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        self.step_count = int(state["step"])
        return self
