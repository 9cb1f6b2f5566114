"""Optimizers and per-epoch LR schedules (reference utils/common_config.py:241-368).

Optimizers are optax chains with torch-matching semantics (AdamW decoupled
weight decay, SGD momentum buffers, RMSprop). The learning rate is injected
as a hyperparameter living inside opt_state, so the per-EPOCH schedule
(reference steps the scheduler once per epoch, train_utils.py:270) is a
host-side scalar update — the jitted train step never recompiles.

Schedules are closed-form functions epoch -> lr, matching torch semantics:

- WarmupStepLR: epochs 0..w-1 at lr/10^(w-e) (SequentialLR warmup quirk,
  common_config.py:339-358), then StepLR with the epoch counter REBASED to 0
  at the warmup boundary: lr * gamma^((e - w) // step_size).
- StepLR / CosineAnnealingLR / OneCycleLR / ConstantLR as in torch.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import optax


def _label_params(params, match: str):
    """Label tree: 'diff' for subtrees whose top-level key contains
    ``match`` (reference get_diff_params splits on the 'postprocessor'
    module name, utils/utils.py:723-745), else 'base'."""
    import jax

    def label_for(path):
        top = path[0].key if path else ""
        return "diff" if match in str(top) else "base"

    return jax.tree_util.tree_map_with_path(lambda p, _: label_for(p), params)


def build_optimizer(p, params=None):
    """p: config with .optimizer, .optimizer_kwargs; returns an optax
    GradientTransformation with injected learning_rate."""
    kw = p.optimizer_kwargs
    lr = kw.lr
    # a YAML "momentum:" / "weight_decay:" with no value parses to None;
    # both must reach optax as floats (momentum feeds optax.trace's decay)
    wd = float(kw.get("weight_decay") or 0.0)
    momentum = float(kw.get("momentum") or 0.0)
    name = p.optimizer.lower()

    def make(lr_value):
        if name == "sgd":
            return optax.inject_hyperparams(_sgd)(
                learning_rate=lr_value, momentum=momentum, weight_decay=wd
            )
        if name == "adam":
            return optax.inject_hyperparams(_adam)(
                learning_rate=lr_value, weight_decay=wd
            )
        if name == "adamw":
            return optax.inject_hyperparams(optax.adamw)(
                learning_rate=lr_value, weight_decay=wd, eps=1e-8
            )
        if name == "rmsprop":
            return optax.inject_hyperparams(_rmsprop)(
                learning_rate=lr_value, momentum=momentum, weight_decay=wd
            )
        raise NotImplementedError(f"Undefined optimizer: {p.optimizer}")

    if kw.get("diff_lr") and params is not None:
        # per-module LR: 'postprocessor' runs at 3e-4 (common_config.py:249-257)
        labels = _label_params(params, "postprocessor")
        return optax.multi_transform(
            {"base": make(lr), "diff": make(0.0003)}, labels
        )
    return make(lr)


def _sgd(learning_rate, momentum, weight_decay):
    # momentum is an injected hyperparam (a tracer under jit), so the chain
    # structure must be static: optax.trace with decay=0 IS plain SGD
    # (buffer = g + 0*buffer), matching torch's momentum=0 semantics.
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_learning_rate(learning_rate),
    )


def _adam(learning_rate, weight_decay):
    # torch Adam applies L2 weight decay to the gradient (not decoupled)
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(eps=1e-8),
        optax.scale_by_learning_rate(learning_rate),
    )


def _rmsprop(learning_rate, momentum, weight_decay):
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_rms(decay=0.99, eps=1e-8),
        optax.trace(decay=momentum),  # decay=0 == no momentum (static chain)
        optax.scale_by_learning_rate(learning_rate),
    )


DIFF_LR = 0.0003  # per-module LR for 'postprocessor' (common_config.py:252)


def set_learning_rate(opt_state, lr: float, base_lr: float | None = None):
    """Update the injected learning-rate hyperparameter(s).

    With diff_lr (multi_transform), torch steps every param group by the
    same multiplicative schedule; the 'diff' group therefore follows
    DIFF_LR * (lr / base_lr)."""
    factor = (lr / base_lr) if base_lr else None

    def visit(s, group=None):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            value = lr
            if group == "diff":
                value = DIFF_LR * factor if factor is not None else DIFF_LR
            old = s.hyperparams["learning_rate"]
            new = jnp.asarray(value, old.dtype)
            # Keep the leaf's sharding: the jitted step returns mesh-sharded
            # state leaves, and swapping in an unsharded scalar here changes
            # the step's input avals -> a full recompile on the next call.
            # device_put_replicated, NOT device_put: a plain device_put onto
            # a sharding that spans processes runs an assert_equal allgather
            # whose lazily-created gloo context flakes (parallel/mesh.py).
            if hasattr(old, "sharding"):
                from jspsr_tpu.parallel.mesh import device_put_replicated
                new = device_put_replicated(new, old.sharding)
            s.hyperparams["learning_rate"] = new
        if hasattr(s, "inner_states"):  # multi_transform
            for name, inner in s.inner_states.items():
                visit(inner.inner_state if hasattr(inner, "inner_state")
                      else inner, group=name)

    visit(opt_state)
    return opt_state


def build_lr_schedule(p):
    """Returns fn(epoch:int) -> float, stepped once per epoch."""
    name = p.scheduler.lower()
    base_lr = p.optimizer_kwargs.lr
    sk = p.get("scheduler_kwargs") or {}
    epochs = p.epochs
    warmup = sk.get("warmup_epoch", 0)
    max_lr = sk.get("max_lr", 0.1)
    step_size = sk.get("step_size") or epochs // 3
    gamma = sk.get("gamma") if sk.get("gamma") is not None else 0.1

    if name == "warmupsteplr":
        def fn(e):
            if e < warmup:
                return base_lr / (10.0 ** (warmup - e))
            return base_lr * gamma ** ((e - warmup) // step_size)
        return fn
    if name == "steplr":
        return lambda e: base_lr * gamma ** (e // step_size)
    if name == "cosineannealinglr":
        eta_min = 1e-6
        return lambda e: eta_min + (base_lr - eta_min) * (
            1 + math.cos(math.pi * e / epochs)
        ) / 2
    if name == "onecyclelr":
        div_factor = 90.0
        final_div = 1e4
        initial = max_lr / div_factor
        final = initial / final_div
        pct_start = 0.3
        up = max(1, int(round(pct_start * epochs)) - 1)
        down = epochs - up - 1

        def fn(e):
            if e <= up:
                t = e / up
                return initial + (max_lr - initial) * (1 - math.cos(math.pi * t)) / 2
            t = min(1.0, (e - up) / max(down, 1))
            return final + (max_lr - final) * (1 + math.cos(math.pi * t)) / 2
        return fn
    if name == "constantlr":
        return lambda e: base_lr
    raise NotImplementedError(f"Undefined scheduler: {p.scheduler}")
