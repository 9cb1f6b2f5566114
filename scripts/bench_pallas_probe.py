"""TPU probe: fused Pallas deformable kernel vs the XLA one-hot path.

All variants compiled + measured in ONE process (tunnel compiles are never
cached across processes). Chained timing throughout: each iteration feeds an
output back into an input, final sync is one scalar fetch.

Usage: python scripts/bench_pallas_probe.py [--batch 16] [--iters 30]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp


def _inputs(batch, h, w, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(0.2, 0.8, (batch, h, w, 1)).astype(np.float32))
    off = jnp.asarray((rng.normal(size=(batch, h, w, 18)) * 1.5)
                      .astype(np.float32))
    mask = jnp.asarray(rng.uniform(0, 1, (batch, h, w, 9)).astype(np.float32))
    wgt = jnp.asarray(rng.normal(size=(3, 3, 1, 1)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(1,)).astype(np.float32))
    return x, off, mask, wgt, bias


def timed(name, fn, chain, iters, warmup=3):
    s = chain
    t_c0 = time.perf_counter()
    for _ in range(warmup):
        s = fn(s)
    float(jnp.ravel(jax.tree_util.tree_leaves(s)[0])[0])
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(s)
    float(jnp.ravel(jax.tree_util.tree_leaves(s)[0])[0])
    ms = 1000 * (time.perf_counter() - t0) / iters
    print(json.dumps({"case": name, "ms": round(ms, 3),
                      "compile_s": round(compile_s, 1)}), flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    b = args.batch

    from jspsr_tpu.ops.deform_conv import deform_conv2d
    from jspsr_tpu.ops.pallas_deform import deform_conv2d_pallas

    x, off, mask, wgt, bias = _inputs(b, 128, 128)
    print(f"# backend {jax.default_backend()} batch {b}", file=sys.stderr)

    # ---- forward: chain x -> out ----
    for name, f in (
        ("fwd_mxu", lambda xx: deform_conv2d(xx, off, wgt, bias, mask,
                                             impl="mxu")),
        ("fwd_pallas", lambda xx: deform_conv2d_pallas(xx, off, wgt, bias,
                                                       mask, 1, True)),
    ):
        jf = jax.jit(f)
        timed(name, lambda s, jf=jf: jnp.clip(jf(s), 0.0, 1.0), x, args.iters)

    # numeric agreement on-device
    d = float(jnp.max(jnp.abs(
        jax.jit(lambda: deform_conv2d(x, off, wgt, bias, mask, impl="mxu")
                - deform_conv2d_pallas(x, off, wgt, bias, mask, 1, True))())))
    print(json.dumps({"case": "fwd_max_abs_diff", "value": d}), flush=True)

    # ---- backward: chain offset -> d_offset (same shape) ----
    def bwd_case(name, impl_fn):
        def step(o):
            g = jax.grad(lambda oo: jnp.sum(impl_fn(oo) ** 2))(o)
            return jnp.clip(g, -3.0, 3.0)
        timed(name, jax.jit(step), off, args.iters)

    bwd_case("bwd_mxu",
             lambda oo: deform_conv2d(x, oo, wgt, bias, mask, impl="mxu"))
    bwd_case("bwd_pallas_xgrad",
             lambda oo: deform_conv2d_pallas(x, oo, wgt, bias, mask, 1, True))
    bwd_case("bwd_pallas_noxgrad",
             lambda oo: deform_conv2d_pallas(x, oo, wgt, bias, mask, 1, False))

    # ---- flagship model forward (impl auto == pallas now) ----
    import __graft_entry__ as g_mod

    model, params, bn_state = g_mod._flagship()
    dem, img, msk = g_mod._example_inputs(b, 128, 128)

    def model_fwd(d):
        pred, _ = model(params, bn_state, [d, img, msk], train=False)
        return jnp.clip(pred, 0.05, 0.95)

    timed("model_fwd_auto", jax.jit(model_fwd), dem, max(args.iters // 2, 5))

    # ---- full train step (auto impl) ----
    from scripts.bench_train_probe import build

    step, state, inputs, gt = build(b)

    def train_once(s):
        s2, losses = step(s, inputs, gt)
        return s2

    timed("train_step_auto", train_once, state, 10)


if __name__ == "__main__":
    main()
