"""TPU probe: speed-of-light table for the flagship TRAIN STEP
(round-2 VERDICT #2 closure: quantify the remaining train headroom).

bench_fwd_sol.py bounded the forward; this bounds the full step. For every
heavy conv shape in the JSPSR 3-branch model it computes a padding-adjusted
MXU speed-of-light for all THREE directions —

  fwd   : contraction k*k*Cin, output lanes Cout
  dgrad : contraction k*k*Cout, output lanes Cin   (transposed kernel)
  wgrad : contraction B*Oh*Ow (never lane-limited), output lanes Cout

each max()ed against its HBM-bandwidth bound — and MEASURES the chained
fwd+bwd time of the op in the same process. The full train step
(bench_train_probe.build) runs last, so the summary line gives

  headroom = (measured_step - sum(model_eff_sol) - nonconv_meas) / measured

where nonconv_meas is the measured cost of everything that is not these
convs (BN stats + their backward, losses, deformable sampling, optimizer),
obtained as measured_step - sum(model conv fwd+bwd measured). That number
is the honest "what could better conv scheduling still buy" bound.

Usage: python scripts/bench_step_sol.py [--dtype bfloat16] [--batch 16]
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

from scripts.bench_bwd_breakdown import (
    SHAPES, kshape, make_fn, out_hw, timed,
)
from scripts.bench_fwd_sol import HBM_BW, PEAK_BF16, PEAK_FP32


def _pad128(n):
    return -(-n // 128) * 128


def sol_ms(flops, in_bytes, out_bytes, peak, contraction, lanes):
    """max(MXU, HBM) with the 128x128 systolic-array padding on the
    contraction and output-lane dims."""
    pad = (_pad128(contraction) / contraction) * (_pad128(lanes) / lanes)
    return max(flops * pad / peak, (in_bytes + out_bytes) / HBM_BW) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    B = args.batch
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    dsize = 2 if args.dtype == "bfloat16" else 4
    peak = PEAK_BF16 if args.dtype == "bfloat16" else PEAK_FP32
    R = int(os.environ.get("REPEATS", "10"))

    rng = np.random.default_rng(0)
    z = jnp.zeros((8, 128), jnp.float32)
    floor = timed(jax.jit(lambda q: q + 1.0), z, 30)
    print(json.dumps({"dispatch_floor_ms": round(floor, 3),
                      "dtype": args.dtype, "batch": B}), flush=True)

    rows = []
    for tag, count, h, w_, cin, cout, kind in SHAPES:
        f = make_fn(kind, cin, cout)
        x = jnp.asarray(rng.normal(size=(B, h, w_, cin))).astype(dt)
        wgt = jnp.asarray(rng.normal(size=kshape(kind, cin, cout)) * 0.02
                          ).astype(dt)
        oh, ow = out_hw(kind, h, w_)
        k = {"s1": 3, "s2": 3, "ds": 1, "ct": 3, "s5": 5}[kind]
        flops = 2 * B * oh * ow * k * k * cin * cout
        xb = dsize * B * h * w_ * cin
        yb = dsize * B * oh * ow * cout
        wb = dsize * k * k * cin * cout

        t_fwd_sol = sol_ms(flops, xb + wb, yb, peak, k * k * cin, cout)
        t_dgrad_sol = sol_ms(flops, yb + wb, xb, peak, k * k * cout, cin)
        # wgrad contracts over B*Oh*Ow (>=128 everywhere here): no K padding
        t_wgrad_sol = sol_ms(flops, xb + yb, wb, peak, 128, cout)
        t_step_sol = t_fwd_sol + t_dgrad_sol + t_wgrad_sol

        proj = jnp.asarray(rng.normal(size=(cout, cin)) * 0.01).astype(dt)

        def back_to_x(y):
            y2 = jnp.einsum("bhwo,oc->bhwc", y, proj)
            if (oh, ow) != (h, w_):
                if oh < h:
                    y2 = jnp.repeat(jnp.repeat(y2, h // oh, 1), w_ // ow, 2)
                else:
                    y2 = y2[:, :: oh // h, :: ow // w_, :]
            return jnp.tanh(y2)

        def bwd_chain(carry):
            xx, ww = carry
            for _ in range(R):
                gx, gw = jax.grad(lambda q, r: jnp.sum(jnp.tanh(f(q, r))),
                                  argnums=(0, 1))(xx, ww)
                xx = xx - 0.001 * jnp.tanh(gx)
                ww = ww - 0.001 * jnp.tanh(gw)
            return xx, ww

        t_all = (timed(jax.jit(bwd_chain), (x, wgt), args.iters) - floor) / R
        rows.append({
            "tag": tag, "kind": kind, "count": count,
            "gflop3": round(3 * flops / 1e9, 2),
            "meas_fwdbwd_ms": round(t_all, 3),
            "sol_fwdbwd_ms": round(t_step_sol, 3),
            "ratio": round(t_all / max(t_step_sol, 1e-9), 2),
            "model_meas_ms": round(count * t_all, 2),
            "model_sol_ms": round(count * t_step_sol, 2),
        })
        print(json.dumps(rows[-1]), flush=True)

    tot_meas = sum(r["model_meas_ms"] for r in rows)
    tot_sol = sum(r["model_sol_ms"] for r in rows)

    # full train step in the same process
    from scripts.bench_train_probe import build

    kw = {"compute_dtype": args.dtype} if args.dtype != "float32" else {}
    step, state, inputs, gt = build(B, **kw)
    for _ in range(2):
        state, losses = step(state, inputs, gt)
    float(losses["Total"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, losses = step(state, inputs, gt)
    float(losses["Total"])
    step_ms = (time.perf_counter() - t0) / args.iters * 1e3

    nonconv = step_ms - tot_meas
    attainable = tot_sol + max(nonconv, 0.0)
    print(json.dumps({
        "sum_conv_fwdbwd_meas_ms": round(tot_meas, 2),
        "sum_conv_fwdbwd_sol_ms": round(tot_sol, 2),
        "conv_efficiency_vs_padded_sol": round(tot_sol / tot_meas, 3),
        "full_step_ms": round(step_ms, 2),
        "nonconv_meas_ms": round(nonconv, 2),
        "attainable_step_ms": round(attainable, 2),
        "conv_headroom_pct": round((tot_meas - tot_sol) / step_ms * 100, 1),
        "tiles_per_sec": round(B / step_ms * 1e3, 1),
        "tiles_per_sec_at_sol": round(B / attainable * 1e3, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
