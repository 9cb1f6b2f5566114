"""Train state pytree and state-merge helpers."""

from __future__ import annotations

from typing import Any, NamedTuple

import jax


class TrainState(NamedTuple):
    params: Any
    bn_state: Any
    opt_state: Any
    step: Any  # int32 scalar


def deep_merge(old: dict, new: dict) -> dict:
    """Merge partial BatchNorm-state updates into the full state tree.

    Model applies return only the subtrees that changed; leaves of ``new``
    override, everything else keeps ``old``.
    """
    if not isinstance(new, dict) or not new:
        return new if new else old
    if not isinstance(old, dict):
        return new
    out = dict(old)
    for k, v in new.items():
        out[k] = deep_merge(old.get(k, {}), v) if isinstance(v, dict) else v
    return out


def tree_size_bytes(tree) -> int:
    return sum(
        x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree)
    )
