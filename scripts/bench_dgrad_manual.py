"""TPU probe: can a MANUAL dgrad beat XLA's autodiff conv backward?

bench_bwd_dirs.py showed the 64-ch 128^2 stride-1 conv's d/dx at 1.8x its
padded SOL (49 TFLOP/s) while the same shape's forward runs at 0.67x
(132 TFLOP/s). For a 3x3 stride-1 SAME conv, dx is EXACTLY another 3x3
stride-1 SAME conv: dx = conv(dy, rot180(W) with I/O swapped). If XLA's
transposed-conv lowering is the problem, expressing the backward as a
plain forward conv should recover forward-level throughput.

Variants per (tag, H, W, Cin, Cout), all chained, dispatch-corrected:
  auto    : jax.grad d/dx of lax conv (baseline, what the model does)
  flip    : manual conv(dy, flip(W).swap(I,O)) as a forward conv
  flipc   : same but with the flipped kernel precomputed OUTSIDE the chain
            (model-realistic: weights are step-constant, flip is free)
  wg_auto : jax.grad d/dw (baseline)
  wg_dot  : manual wgrad as one dot_general over im2col patches
            (contract B*H*W; MXU-shaped reduction)

Usage: python scripts/bench_dgrad_manual.py [--dtype bfloat16] [--batch 16]
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
from scripts.bench_fwd_sol import PEAK_BF16, PEAK_FP32

CASES = [
    ("s1_64x128", 128, 128, 64, 64),
    ("spn_128x128", 128, 128, 128, 128),
    ("s1_32x128", 128, 128, 32, 32),
]

R = int(os.environ.get("REPEATS", "10"))


def _pad128(n):
    return -(-n // 128) * 128


def conv(xx, ww):
    return lax.conv_general_dilated(xx, ww, (1, 1), ((1, 1), (1, 1)),
                                    dimension_numbers=DIMS)


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
        dy = jnp.asarray(rng.normal(size=(B, h, w_, cout))).astype(dt)
        # model-realistic precomputed flip: rot180 + swap I/O -> HWIO with
        # I=cout, O=cin
        wgt_f = jnp.flip(wgt, (0, 1)).transpose(0, 1, 3, 2)

        # --- correctness first (fp32, small tolerance in bf16) ---
        g_auto = jax.grad(lambda q: jnp.vdot(conv(q, wgt), dy))(x)
        g_man = conv(dy, wgt_f)
        err = float(jnp.max(jnp.abs(g_auto - g_man)) /
                    (jnp.max(jnp.abs(g_auto)) + 1e-9))
        gw_auto = jax.grad(lambda r: jnp.vdot(conv(x, r), dy))(wgt)

        def wgrad_dot(xx, gg):
            # im2col patches of x (SAME, 3x3) contracted with dy over
            # (B, H, W): dw[kh,kw,i,o] = sum_bhw xpad[b,h+kh,w+kw,i]*g[b,h,w,o]
            xp = jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (0, 0)))
            cols = [xp[:, kh:kh + h, kw:kw + w_, :]
                    for kh in range(3) for kw in range(3)]
            pat = jnp.stack(cols, 0).reshape(9, B * h * w_, cin)
            gfl = gg.reshape(B * h * w_, cout)
            dw = lax.dot_general(
                pat, gfl, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return dw.reshape(3, 3, cin, cout).astype(gg.dtype)

        gw_man = wgrad_dot(x, dy)
        errw = float(jnp.max(jnp.abs(gw_auto.astype(jnp.float32) -
                                     gw_man.astype(jnp.float32))) /
                     (jnp.max(jnp.abs(gw_auto.astype(jnp.float32))) + 1e-9))

        # --- chained timings ---
        def auto_chain(carry):
            xx = carry
            for _ in range(R):
                gx = jax.grad(lambda q: jnp.sum(jnp.tanh(conv(q, wgt))))(xx)
                xx = xx - 0.001 * jnp.tanh(gx)
            return xx

        def flip_chain(carry):
            xx = carry
            for _ in range(R):
                yy = jnp.tanh(conv(xx, wgt))
                gy = 1.0 - yy * yy  # same cotangent math as autodiff
                wf = jnp.flip(wgt, (0, 1)).transpose(0, 1, 3, 2)
                gx = conv(gy.astype(dt), wf)
                xx = xx - 0.001 * jnp.tanh(gx)
            return xx

        def flipc_chain(carry):
            xx = carry
            for _ in range(R):
                yy = jnp.tanh(conv(xx, wgt))
                gy = 1.0 - yy * yy
                gx = conv(gy.astype(dt), wgt_f)
                xx = xx - 0.001 * jnp.tanh(gx)
            return xx

        def fwd_chain(carry):
            xx = carry
            for _ in range(R):
                xx = jnp.tanh(conv(xx, wgt)[..., :cin])
            return xx

        def wg_auto_chain(carry):
            ww = carry
            for _ in range(R):
                gw = jax.grad(lambda r: jnp.sum(jnp.tanh(conv(x, r))))(ww)
                ww = ww - 0.001 * jnp.tanh(gw)
            return ww

        def wg_dot_chain(carry):
            ww = carry
            for _ in range(R):
                yy = jnp.tanh(conv(x, ww))
                gw = wgrad_dot(x, (1.0 - yy * yy).astype(dt))
                ww = ww - 0.001 * jnp.tanh(gw)
            return ww

        t_fwd = (timed(jax.jit(fwd_chain), x, args.iters) - floor) / R
        t_auto = (timed(jax.jit(auto_chain), x, args.iters) - floor) / R
        t_flip = (timed(jax.jit(flip_chain), x, args.iters) - floor) / R
        t_flipc = (timed(jax.jit(flipc_chain), x, args.iters) - floor) / R
        t_wga = (timed(jax.jit(wg_auto_chain), wgt, args.iters) - floor) / R
        t_wgd = (timed(jax.jit(wg_dot_chain), wgt, args.iters) - floor) / R

        flops = 2 * B * h * w_ * 9 * cin * cout
        sol_d = flops * ((_pad128(9 * cout) / (9 * cout)) *
                         (_pad128(cin) / cin)) / peak * 1e3
        sol_w = flops * (_pad128(cout) / cout) / peak * 1e3
        print(json.dumps({
            "tag": tag, "rel_err_dgrad": round(err, 7),
            "rel_err_wgrad": round(errw, 7),
            "fwd_ms": round(t_fwd, 3),
            "dgrad_auto_ms": round(t_auto - t_fwd, 3),
            "dgrad_flip_ms": round(t_flip - t_fwd, 3),
            "dgrad_flipc_ms": round(t_flipc - t_fwd, 3),
            "dgrad_sol_ms": round(sol_d, 3),
            "wgrad_auto_ms": round(t_wga, 3),
            "wgrad_dot_ms": round(t_wgd, 3),
            "wgrad_sol_ms": round(sol_w, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
