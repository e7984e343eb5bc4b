"""Parameter initializers — reference ``torch_geometric/nn/inits.py:6-51``.

Exposed as flax-compatible initializer factories: each returns a callable
``init(key, shape, dtype) -> Array``.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def glorot():
    """U(-a, a) with a = sqrt(6 / (fan_in + fan_out)) (reference ``glorot``)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _fans(shape)
        a = math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -a, a)

    return init


def uniform(size: int):
    """U(-1/sqrt(size), 1/sqrt(size)) (reference ``uniform``)."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(size)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def normal(std: float = 1.0, mean: float = 0.0):
    """N(mean, std) (reference ``inits.normal``, used by FeaStConv)."""

    def init(key, shape, dtype=jnp.float32):
        return mean + std * jax.random.normal(key, shape, dtype)

    return init


def kaiming_uniform(a: float = math.sqrt(5.0)):
    """torch.nn.Linear's default weight init (kaiming uniform, fan_in)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, _ = _fans(shape)
        gain = math.sqrt(2.0 / (1.0 + a * a))
        bound = gain * math.sqrt(3.0 / fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def linear_bias(fan_in: int):
    """torch.nn.Linear's default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def zeros():
    return lambda key, shape, dtype=jnp.float32: jnp.zeros(shape, dtype)


def ones():
    return lambda key, shape, dtype=jnp.float32: jnp.ones(shape, dtype)


def glorot_orthogonal(scale: float = 2.0):
    """Orthogonal scaled to var = scale/(fan_in+fan_out) (reference)."""

    def init(key, shape, dtype=jnp.float32):
        w = jax.nn.initializers.orthogonal()(key, shape, dtype)
        fan_in, fan_out = _fans(shape)
        w = w * jnp.sqrt(scale / ((fan_in + fan_out) * jnp.var(w)))
        return w

    return init


def _fans(shape):
    if len(shape) < 1:
        return 1, 1
    if len(shape) == 1:
        return shape[0], shape[0]
    # flax Dense kernels are [in, out]
    receptive = 1
    for s in shape[:-2]:
        receptive *= s
    return shape[-2] * receptive, shape[-1] * receptive
