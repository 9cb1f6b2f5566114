"""TPU probe: which backward DIRECTION of the 64-ch full-res convs is slow?

bench_step_sol.py showed the stage-1/SPN 64-ch 128² stride-1 convs at
~1.7× their padded fwd+bwd SOL while wide convs sit at the bound. This
probe splits that: for selected shapes it measures, all in one process,
glue-corrected —

  glue     : the feedback chain alone (projection einsum + tanh + update)
  fwd      : conv forward
  dgrad    : d/dx only  (vjp with weight non-diff)
  wgrad    : d/dw only  (vjp with input non-diff)
  both     : d/dx + d/dw

each as a chained R-in-jit loop, dispatch-floor corrected, with the glue
chain measured separately and subtracted. Prints measured ms and TFLOP/s
per direction vs the 128-lane padded SOL so the slow direction (and its
true efficiency) is unambiguous.

Usage: python scripts/bench_bwd_dirs.py [--dtype bfloat16] [--batch 16]
"""

import argparse
import json
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from scripts.bench_bwd_breakdown import DIMS, timed
from scripts.bench_fwd_sol import HBM_BW, PEAK_BF16, PEAK_FP32

# (tag, H, W, Cin, Cout): the suspect narrow rows + a wide control
CASES = [
    ("s1_64x128", 128, 128, 64, 64),
    ("spn_128x128", 128, 128, 128, 128),
    ("s1_512x16", 16, 16, 512, 512),
]

R = int(os.environ.get("REPEATS", "10"))


def _pad128(n):
    return -(-n // 128) * 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    B = args.batch
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    peak = PEAK_BF16 if args.dtype == "bfloat16" else PEAK_FP32

    rng = np.random.default_rng(0)
    z = jnp.zeros((8, 128), jnp.float32)
    floor = timed(jax.jit(lambda q: q + 1.0), z, 30)
    print(json.dumps({"dispatch_floor_ms": round(floor, 3),
                      "dtype": args.dtype, "batch": B}), flush=True)

    for tag, h, w_, cin, cout in CASES:
        x = jnp.asarray(rng.normal(size=(B, h, w_, cin))).astype(dt)
        wgt = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.02).astype(dt)
        proj = jnp.asarray(rng.normal(size=(cout, cin)) * 0.01).astype(dt)

        def conv(xx, ww):
            return lax.conv_general_dilated(xx, ww, (1, 1),
                                            ((1, 1), (1, 1)),
                                            dimension_numbers=DIMS)

        def back_to_x(y):
            return jnp.tanh(jnp.einsum("bhwo,oc->bhwc", y, proj))

        def glue_chain(xx):
            for _ in range(R):
                # same glue as the other chains, conv replaced by a slice
                # that reuses xx's leading Cout channels as a stand-in y
                xx = back_to_x(xx[..., :cout] if cout <= cin
                               else jnp.concatenate([xx] * (cout // cin), -1))
            return xx

        def fwd_chain(xx):
            for _ in range(R):
                xx = back_to_x(conv(xx, wgt))
            return xx

        def make_grad_chain(wrt):
            def chain(carry):
                xx, ww = carry
                for _ in range(R):
                    if wrt == "x":
                        gx = jax.grad(
                            lambda q: jnp.sum(jnp.tanh(conv(q, ww))))(xx)
                        xx = xx - 0.001 * jnp.tanh(gx)
                    elif wrt == "w":
                        gw = jax.grad(
                            lambda r: jnp.sum(jnp.tanh(conv(xx, r))))(ww)
                        ww = ww - 0.001 * jnp.tanh(gw)
                        xx = jnp.tanh(xx)  # keep xx in the chain too
                    else:
                        gx, gw = jax.grad(
                            lambda q, r: jnp.sum(jnp.tanh(conv(q, r))),
                            argnums=(0, 1))(xx, ww)
                        xx = xx - 0.001 * jnp.tanh(gx)
                        ww = ww - 0.001 * jnp.tanh(gw)
                return xx, ww
            return chain

        t_glue = (timed(jax.jit(glue_chain), x, args.iters) - floor) / R
        t_fwd = (timed(jax.jit(fwd_chain), x, args.iters) - floor) / R
        t_dg = (timed(jax.jit(make_grad_chain("x")), (x, wgt), args.iters)
                - floor) / R
        t_wg = (timed(jax.jit(make_grad_chain("w")), (x, wgt), args.iters)
                - floor) / R
        t_bo = (timed(jax.jit(make_grad_chain("both")), (x, wgt), args.iters)
                - floor) / R

        flops = 2 * B * h * w_ * 9 * cin * cout
        pad_in = (_pad128(9 * cin) / (9 * cin)) * (_pad128(cout) / cout)
        pad_dg = (_pad128(9 * cout) / (9 * cout)) * (_pad128(cin) / cin)
        sol_f = flops * pad_in / peak * 1e3
        sol_d = flops * pad_dg / peak * 1e3
        sol_w = flops * (_pad128(cout) / cout) / peak * 1e3

        fwd = t_fwd - t_glue
        # grad chains carry fwd + the direction('s) backward + glue
        dgrad = t_dg - t_fwd
        wgrad = t_wg - t_fwd
        both = t_bo - t_fwd
        print(json.dumps({
            "tag": tag, "glue_ms": round(t_glue, 3),
            "fwd_ms": round(fwd, 3), "fwd_vs_sol": round(fwd / sol_f, 2),
            "dgrad_ms": round(dgrad, 3),
            "dgrad_vs_sol": round(dgrad / sol_d, 2),
            "wgrad_ms": round(wgrad, 3),
            "wgrad_vs_sol": round(wgrad / sol_w, 2),
            "both_ms": round(both, 3),
            "both_vs_sol": round(both / (sol_d + sol_w), 2),
            "tflops_fwd": round(flops / fwd / 1e9, 1),
            "tflops_dgrad": round(flops / max(dgrad, 1e-9) / 1e9, 1),
            "tflops_wgrad": round(flops / max(wgrad, 1e-9) / 1e9, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
