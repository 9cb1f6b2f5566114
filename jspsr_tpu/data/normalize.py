"""Elevation scaling (reference data/data_utils.py:289-312,441-457).

Two schemes, identical forward/backward round-trip semantics:
- minmax:       y = (x - min) / (max - min)
- log-minmax:   y = log(x - min) / log(max - min) + 1e-8
with optional per-tile relative base (x -> x - base) applied before scaling.

Works on numpy arrays (host pipeline) and jnp arrays (on-device metrics).
"""

from __future__ import annotations

import numpy as np


def scale_data(data, elev_min, elev_max, elev_log: bool = False, base_elev=0.0):
    xp = _mod(data)
    data = data - base_elev if _nonzero(base_elev) else data
    if elev_log:
        return xp.log(data - elev_min) / xp.log(elev_max - elev_min) + 1e-8
    return (data - elev_min) / (elev_max - elev_min)


def descale_data(data, elev_min, elev_max, elev_log: bool = False):
    xp = _mod(data)
    if elev_log:
        return xp.exp(data * np.log(elev_max - elev_min)) + elev_min
    return data * (elev_max - elev_min) + elev_min


def _mod(x):
    if isinstance(x, np.ndarray) or np.isscalar(x):
        return np
    import jax.numpy as jnp

    return jnp


def _nonzero(v):
    try:
        return float(v) != 0.0
    except TypeError:
        return True  # traced/array base: always apply
