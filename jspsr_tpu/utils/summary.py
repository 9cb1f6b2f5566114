"""Model summaries (reference utils/utils.py:80-135,709-720 via torchinfo):
per-module parameter counts and total size, plus a jitted-forward shape/cost
report using jax.eval_shape + XLA cost analysis."""

from __future__ import annotations

import jax

from jspsr_tpu.train.checkpoint import flatten_tree


def count_parameters(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def model_summary(model, params, state, example_inputs, max_depth: int = 1):
    """Returns a text table of per-subtree parameter counts and the traced
    output shapes; optionally XLA FLOP estimate of the eval forward."""
    lines = []
    flat = flatten_tree(params)
    groups: dict = {}
    for k, v in flat.items():
        top = "/".join(k.split("/")[:max_depth])
        groups[top] = groups.get(top, 0) + v.size
    width = max(len(k) for k in groups)
    for k in sorted(groups):
        lines.append(f"{k:<{width}}  {groups[k]:>12,}")
    total = count_parameters(params)
    lines.append(f"{'TOTAL':<{width}}  {total:>12,}")

    out = jax.eval_shape(
        lambda p, s, x: model(p, s, x, train=False)[0], params, state,
        example_inputs,
    )
    lines.append(f"output: {out.shape} {out.dtype}")

    try:
        lowered = jax.jit(
            lambda p, s, x: model(p, s, x, train=False)[0]
        ).lower(params, state, example_inputs)
        cost = lowered.cost_analysis()
        if cost and "flops" in cost:
            lines.append(f"forward flops: {cost['flops']:.3e}")
    except Exception:
        pass
    return "\n".join(lines)


def trace_step(fn, *args, log_dir: str = "/tmp/jspsr_trace", **kwargs):
    """Capture a jax.profiler trace around one call (reference had only an
    ad-hoc ms/MB probe, utils.py:1630-1636)."""
    with jax.profiler.trace(log_dir):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    return out, log_dir
