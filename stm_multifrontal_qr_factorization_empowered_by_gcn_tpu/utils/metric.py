"""Classification metrics — reference ``torch_geometric/utils/metric.py``."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def accuracy(pred: jnp.ndarray, target: jnp.ndarray, mask=None) -> jnp.ndarray:
    """Fraction of correct predictions, optionally masked (reference ``utils/metric.py:accuracy``)."""
    correct = (pred == target).astype(jnp.float32)
    if mask is not None:
        return jnp.sum(correct * mask) / jnp.maximum(jnp.sum(mask), 1)
    return jnp.mean(correct)


def true_positive(pred, target, num_classes):
    """Per-class count of ``pred == c`` and ``target == c``."""
    return jnp.array(
        [jnp.sum((pred == c) & (target == c)) for c in range(num_classes)]
    )


def true_negative(pred, target, num_classes):
    """Per-class count of ``pred != c`` and ``target != c``."""
    return jnp.array(
        [jnp.sum((pred != c) & (target != c)) for c in range(num_classes)]
    )


def false_positive(pred, target, num_classes):
    """Per-class count of ``pred == c`` but ``target != c``."""
    return jnp.array(
        [jnp.sum((pred == c) & (target != c)) for c in range(num_classes)]
    )


def false_negative(pred, target, num_classes):
    """Per-class count of ``pred != c`` but ``target == c``."""
    return jnp.array(
        [jnp.sum((pred != c) & (target == c)) for c in range(num_classes)]
    )


def precision(pred, target, num_classes):
    """Per-class precision ``tp / (tp + fp)`` (reference ``utils/metric.py:precision``)."""
    tp = true_positive(pred, target, num_classes).astype(jnp.float32)
    fp = false_positive(pred, target, num_classes).astype(jnp.float32)
    return tp / jnp.maximum(tp + fp, 1)


def recall(pred, target, num_classes):
    """Per-class recall ``tp / (tp + fn)`` (reference ``utils/metric.py:recall``)."""
    tp = true_positive(pred, target, num_classes).astype(jnp.float32)
    fn = false_negative(pred, target, num_classes).astype(jnp.float32)
    return tp / jnp.maximum(tp + fn, 1)


def f1_score(pred, target, num_classes):
    """Per-class F1 ``2pr / (p + r)`` (reference ``utils/metric.py:f1_score``)."""
    p = precision(pred, target, num_classes)
    r = recall(pred, target, num_classes)
    return 2 * p * r / jnp.maximum(p + r, 1e-12)


def intersection_and_union(pred, target, num_classes, batch=None):
    """reference ``metric.py:intersection_and_union`` — per-class (i, u)
    one-hot overlaps (optionally per graph via ``batch``)."""
    pred = jnp.asarray(pred).reshape(-1)
    target = jnp.asarray(target).reshape(-1)
    p = jax.nn.one_hot(pred, num_classes, dtype=jnp.int32)
    t = jax.nn.one_hot(target, num_classes, dtype=jnp.int32)
    if batch is None:
        i = jnp.sum(p & t, axis=0)
        u = jnp.sum(p | t, axis=0)
    else:
        from ..ops.segment import segment_sum

        b = jnp.asarray(batch)
        nseg = int(b.max()) + 1
        i = segment_sum((p & t).astype(jnp.float32), b, nseg)
        u = segment_sum((p | t).astype(jnp.float32), b, nseg)
    return i, u


def mean_iou(pred, target, num_classes, batch=None):
    """reference ``metric.py:mean_iou`` — mean intersection-over-union
    (absent classes count as IoU 1, like the reference's nan-to-1)."""
    i, u = intersection_and_union(pred, target, num_classes, batch)
    iou = jnp.where(u > 0, i / jnp.maximum(u, 1), 1.0)
    return jnp.mean(iou, axis=-1)
