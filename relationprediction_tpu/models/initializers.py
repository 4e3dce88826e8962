"""Weight initializers matching the reference's numerics.

The reference's ``glorot_variance`` (``shared_functions.py:12-13``) is
actually used as a *standard deviation*: ``np.random.normal(mean, variance)``
takes scale as its second argument, so weights are N(0, (3/sqrt(fi+fo))^2).
We reproduce that exactly, quirk included.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def glorot_std(fan_in: int, fan_out: int) -> float:
    return 3.0 / math.sqrt(fan_in + fan_out)


def normal(key, shape, std: float) -> jax.Array:
    return std * jax.random.normal(key, shape, dtype=jnp.float32)


def uniform(key, shape, low: float, high: float) -> jax.Array:
    return jax.random.uniform(key, shape, minval=low, maxval=high,
                              dtype=jnp.float32)


def zeros(shape) -> jax.Array:
    return jnp.zeros(shape, dtype=jnp.float32)


def ones(shape) -> jax.Array:
    return jnp.ones(shape, dtype=jnp.float32)
