"""TPU probe: per-op speed-of-light table for the flagship FORWARD
(round-2 VERDICT #2 evidence).

For every heavy op shape in the JSPSR 3-branch forward (the SHAPES table of
bench_bwd_breakdown) this measures the bf16 op time (chained, dispatch-floor
corrected) and compares it against the v5e roofline:

    t_sol = max(FLOPs / MXU_peak, bytes_moved / HBM_bw)

The sum of per-op speed-of-light times bounds the achievable forward; the
measured/SOL ratio per op shows which layers still have headroom and
whether they are compute- (mxu) or bandwidth- (hbm) bound. The full-model
eval forward is measured in the SAME process for an apples-to-apples total.

Usage: python scripts/bench_fwd_sol.py [--dtype bfloat16] [--batch 16]
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

# TPU v5e single-chip peaks (public spec): 197 TFLOP/s bf16, ~394 int8;
# fp32 runs through the MXU at roughly half bf16. HBM ~819 GB/s.
PEAK_BF16 = 197e12
PEAK_FP32 = 98.5e12
HBM_BW = 819e9


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
        bytes_moved = dsize * (B * h * w_ * cin + B * oh * ow * cout
                               + k * k * cin * cout)
        t_mxu = flops / peak * 1e3
        t_hbm = bytes_moved / HBM_BW * 1e3
        t_sol = max(t_mxu, t_hbm)
        # MXU-tiling-adjusted bound: the 128x128 systolic array pads the
        # contraction (k*k*cin) and output-channel dims to multiples of
        # 128, so narrow-channel convs (the whole JSPSR front end at
        # nf=32) cannot reach nominal peak regardless of lowering —
        # bench_conv_variants measured every exact re-expression
        # (block-diag / grouped / batch-group / space-to-depth) SLOWER
        # than XLA's native conv, so this is the honest attainable floor.
        kdim = k * k * cin
        pad_f = ((-(-kdim // 128) * 128) / kdim) * ((-(-cout // 128) * 128)
                                                    / cout)
        t_eff = max(t_mxu * pad_f, t_hbm)

        proj = jnp.asarray(rng.normal(size=(cout, cin)) * 0.01).astype(dt)

        def back_to_x(y):
            y2 = jnp.einsum("bhwo,oc->bhwc", y, proj)
            if (oh, ow) != (h, w_):
                if oh < h:
                    y2 = jnp.repeat(jnp.repeat(y2, h // oh, 1), w_ // ow, 2)
                else:
                    y2 = y2[:, :: oh // h, :: ow // w_, :]
            return jnp.tanh(y2)

        def fwd_chain(xx):
            for _ in range(R):
                xx = back_to_x(f(xx, wgt))
            return xx

        t_fwd = (timed(jax.jit(fwd_chain), x, args.iters) - floor) / R
        rows.append({
            "tag": tag, "kind": kind, "count": count,
            "gflop": round(flops / 1e9, 2),
            "mb": round(bytes_moved / 1e6, 1),
            "meas_ms": round(t_fwd, 3),
            "sol_ms": round(t_sol, 3),
            "eff_sol_ms": round(t_eff, 3),
            "bound": "mxu" if t_mxu >= t_hbm else "hbm",
            "ratio": round(t_fwd / max(t_sol, 1e-9), 2),
            "eff_ratio": round(t_fwd / max(t_eff, 1e-9), 2),
            "model_ms": round(count * t_fwd, 2),
            "model_sol_ms": round(count * t_sol, 2),
            "model_eff_sol_ms": round(count * t_eff, 2),
        })
        print(json.dumps(rows[-1]), flush=True)

    tot = sum(r["model_ms"] for r in rows)
    tot_sol = sum(r["model_sol_ms"] for r in rows)
    tot_eff = sum(r["model_eff_sol_ms"] for r in rows)

    # full-model eval forward in the same process
    import __graft_entry__ as g

    kw = {"compute_dtype": args.dtype} if args.dtype != "float32" else {}
    model, params, bn_state = g._flagship(**kw)
    dem, img, msk = g._example_inputs(B, 128, 128)

    jfn = jax.jit(lambda d, i, m: model(params, bn_state, [d, i, m],
                                        train=False)[0])
    d = dem
    for _ in range(3):
        d = jnp.clip(jfn(d, img, msk), 0.05, 0.95)
    float(d[0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(20):
        d = jnp.clip(jfn(d, img, msk), 0.05, 0.95)
    float(d[0, 0, 0, 0])
    full_ms = (time.perf_counter() - t0) / 20 * 1e3

    print(json.dumps({
        "sum_conv_meas_ms": round(tot, 2),
        "sum_conv_sol_ms": round(tot_sol, 2),
        "sum_conv_eff_sol_ms": round(tot_eff, 2),
        "conv_efficiency": round(tot_sol / tot, 3),
        "conv_eff_adjusted": round(tot_eff / tot, 3),
        "full_model_fwd_ms": round(full_ms, 2),
        "non_conv_ms": round(full_ms - tot, 2),
        "headroom_vs_sol_pct": round((full_ms - tot_sol) / full_ms * 100, 1),
        "headroom_vs_eff_sol_pct": round((full_ms - tot_eff) / full_ms * 100,
                                         1),
    }), flush=True)


if __name__ == "__main__":
    main()
