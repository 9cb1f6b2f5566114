"""Weighted loss composition (reference losses/loss_schemes.py).

Returns a dict of named loss scalars plus 'Total' (weighted sum) — the train
step differentiates 'Total'. Pure functions of (pred, gt): safe under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

from jspsr_tpu.losses.functions import get_loss


class SingleLoss:
    def __init__(self, name: str, weight: float = 1.0):
        self.name = name
        self.weight = weight
        self.fn = get_loss(name)

    def __call__(self, pred, gt):
        v = self.fn(pred, gt)
        return {self.name: v, "Total": v}


class MultiLoss:
    def __init__(self, loss_weights: dict):
        self.loss_weights = dict(loss_weights)
        self.fns = {name: get_loss(name) for name in self.loss_weights}

    def __call__(self, pred, gt):
        out = {name: fn(pred, gt) for name, fn in self.fns.items()}
        out["Total"] = jnp.sum(
            jnp.stack([self.loss_weights[n] * out[n] for n in self.fns])
        )
        return out


def build_criterion(loss_cfg: dict):
    """loss_cfg: {name: weight} — e.g. {'L1': 1, 'L2': 1, 'Grad': 0.1}
    (reference utils/common_config.py:209-233)."""
    if len(loss_cfg) == 1:
        ((name, weight),) = loss_cfg.items()
        return SingleLoss(name, weight)
    return MultiLoss(loss_cfg)
