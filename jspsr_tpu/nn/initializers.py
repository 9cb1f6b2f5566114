"""Weight initializers matching the reference's schemes.

The reference initializes every conv in JSPSR with a truncated normal,
std = sqrt(1.3 * 2 / n), n = kh*kw*in_channels, truncated at +/-2 std
(reference: models/JSPSR.py:494-517), and EDSR with a plain normal,
std = sqrt(2 / n), n = kh*kw*out_channels (models/EDSR.py:113-118).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def trunc_normal_fan_in(scale: float = 1.3 * 2.0):
    """Truncated-normal init; std = sqrt(scale / (kh*kw*cin)); trunc at 2 std.

    Weight shape is HWIO: (kh, kw, cin, cout).
    """

    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin, _ = shape
        std = math.sqrt(scale / (kh * kw * cin))
        return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * std

    return init


def normal_fan_out(scale: float = 2.0):
    """Normal init; std = sqrt(scale / (kh*kw*cout)). EDSR-style."""

    def init(key, shape, dtype=jnp.float32):
        kh, kw, _, cout = shape
        std = math.sqrt(scale / (kh * kw * cout))
        return jax.random.normal(key, shape, dtype) * std

    return init


def kaiming_uniform_torch():
    """torch's default Conv2d weight init: kaiming_uniform(a=sqrt(5)).

    Reduces to U(-b, b) with b = sqrt(6 / ((1 + 5) * fan_in)) = 1/sqrt(fan_in).
    """

    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin, _ = shape
        fan_in = kh * kw * cin
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def zeros(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(key, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)
