"""Minimal functional module system.

Design goals (TPU-first, not a torch port):

- A ``Module`` is a *configuration* object: it holds hyperparameters and child
  modules but never holds arrays.
- ``init(rng)`` returns ``(params, state)`` — two nested dicts (pytrees).
  ``params`` are trainable leaves; ``state`` holds non-trainable buffers
  (BatchNorm running statistics).
- Forward is ``module(params, state, *args, train=...) -> (out, new_state)``,
  a pure function: jittable, vmappable, shardable with pjit.

Child modules are registered automatically on attribute assignment, in
definition order, which makes ``init`` deterministic and gives every leaf a
stable path (used by the torch-checkpoint importer).
"""

from __future__ import annotations

from collections import OrderedDict

import jax


class Module:
    """Base class for all modules. Subclasses set child modules as attributes."""

    def __init__(self):
        object.__setattr__(self, "_children", OrderedDict())

    def __setattr__(self, name, value):
        children = self.__dict__.get("_children")
        if children is not None:
            if isinstance(value, Module):
                children[name] = value
            elif name in children and value is None:
                del children[name]
        object.__setattr__(self, name, value)

    # -- init -----------------------------------------------------------
    def init(self, rng):
        """Default init: recurse into children (deterministic fold_in order)."""
        params, state = {}, {}
        for i, (name, child) in enumerate(self._children.items()):
            p, s = child.init(jax.random.fold_in(rng, i))
            if p:
                params[name] = p
            if s:
                state[name] = s
        return params, state

    # -- forward ---------------------------------------------------------
    def __call__(self, params, state, *args, train: bool = False):
        raise NotImplementedError(type(self).__name__)

    # -- utilities --------------------------------------------------------
    def children(self):
        return self._children.items()

    def named_leaves(self, prefix=()):
        """Yield (path, module) for every leaf module (no children)."""
        if not self._children:
            yield prefix, self
            return
        for name, child in self._children.items():
            yield from child.named_leaves(prefix + (name,))


class ParamLeaf(Module):
    """A bare trainable tensor (torch nn.Parameter equivalent)."""

    def __init__(self, shape, init_fn=None):
        super().__init__()
        self.shape = tuple(shape)
        self.init_fn = init_fn

    def init(self, rng):
        import jax.numpy as jnp

        if self.init_fn is not None:
            value = self.init_fn(rng, self.shape)
        else:
            value = jnp.zeros(self.shape, jnp.float32)
        return {"value": value}, {}

    def __call__(self, params, state, train: bool = False):
        return params["value"], {}


class Sequential(Module):
    """Applies child modules in order. Children are named '0', '1', ..."""

    def __init__(self, *mods):
        super().__init__()
        self.mods = []
        for i, m in enumerate(mods):
            if m is None:
                continue
            setattr(self, str(i), m)
            self.mods.append((str(i), m))

    def __call__(self, params, state, x, train: bool = False):
        new_state = {}
        for name, m in self.mods:
            x, s = m(params.get(name, {}), state.get(name, {}), x, train=train)
            if s:
                new_state[name] = s
        return x, new_state


def child_apply(module, params, state, name, *args, train=False):
    """Apply a named child, returning (out, child_new_state)."""
    return module(params.get(name, {}), state.get(name, {}), *args, train=train)


def merge_state(old, updates):
    """Merge child state updates into a copy of ``old`` (shallow per-child)."""
    out = dict(old)
    out.update({k: v for k, v in updates.items() if v})
    return out


def param_count(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
