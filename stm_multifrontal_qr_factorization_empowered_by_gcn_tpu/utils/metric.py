"""Classification metrics — reference ``torch_geometric/utils/metric.py``."""
from __future__ import annotations

import jax.numpy as jnp


def accuracy(pred: jnp.ndarray, target: jnp.ndarray, mask=None) -> jnp.ndarray:
    correct = (pred == target).astype(jnp.float32)
    if mask is not None:
        return jnp.sum(correct * mask) / jnp.maximum(jnp.sum(mask), 1)
    return jnp.mean(correct)


def true_positive(pred, target, num_classes):
    return jnp.array(
        [jnp.sum((pred == c) & (target == c)) for c in range(num_classes)]
    )


def true_negative(pred, target, num_classes):
    return jnp.array(
        [jnp.sum((pred != c) & (target != c)) for c in range(num_classes)]
    )


def false_positive(pred, target, num_classes):
    return jnp.array(
        [jnp.sum((pred == c) & (target != c)) for c in range(num_classes)]
    )


def false_negative(pred, target, num_classes):
    return jnp.array(
        [jnp.sum((pred != c) & (target == c)) for c in range(num_classes)]
    )


def precision(pred, target, num_classes):
    tp = true_positive(pred, target, num_classes).astype(jnp.float32)
    fp = false_positive(pred, target, num_classes).astype(jnp.float32)
    return tp / jnp.maximum(tp + fp, 1)


def recall(pred, target, num_classes):
    tp = true_positive(pred, target, num_classes).astype(jnp.float32)
    fn = false_negative(pred, target, num_classes).astype(jnp.float32)
    return tp / jnp.maximum(tp + fn, 1)


def f1_score(pred, target, num_classes):
    p = precision(pred, target, num_classes)
    r = recall(pred, target, num_classes)
    return 2 * p * r / jnp.maximum(p + r, 1e-12)
