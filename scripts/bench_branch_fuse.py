"""TPU probe: fuse the per-branch stage-body convs across branches.

The step-SOL table (PERF.md) pins the remaining train gap on the 64-ch
full-res stride-1 convs (stage-1 x12, SPN x3) running at 1.7x their padded
SOL: Cout=64 fills half the MXU's 128 output lanes and every exact
re-expression of a SINGLE conv measured slower at step level. But the
three encoder branches run the SAME (Cin, Cout, H, W) conv at every body
position with different weights on different inputs — those N independent
convs can be ONE grouped conv over the channel-concatenated input
(feature_group_count=N, exact arithmetic, no cross-branch mixing), giving
XLA 3x the work per conv kernel. Round-1 measured grouped convs +16%
op-level for the guidance branches and rejected them for importer surgery;
this revisits the idea as a pure forward-time re-expression (params stay
per-branch, weights are concatenated inside the forward — no checkpoint or
importer change).

Variants per shape (N branches, C channels):
  sep   : N chained separate convs (the shipped lowering)
  grp   : one conv, Cin=N*C, feature_group_count=N, kernel (3,3,C,N*C)
  dense : one DENSE block-diagonal conv (N*C -> N*C): N x FLOPs but full
          MXU lanes — wins only if lane waste dominates

Usage: python scripts/bench_branch_fuse.py [--dtype bfloat16] [--batch 16]
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

from scripts.bench_bwd_breakdown import timed

DIMS = ("NHWC", "HWIO", "NHWC")

# (tag, model_count_of_grouped_positions, H, W, C, N_branches)
CASES = [
    ("s1_64x128", 4, 128, 128, 64, 3),   # stage-1 bodies: 12 convs -> 4
    ("s2_128x64", 3, 64, 64, 128, 3),    # stage-2 bodies: 9 convs -> 3
    ("s3_256x32", 3, 32, 32, 256, 3),    # stage-3 bodies
    ("s4_512x16", 3, 16, 16, 512, 3),    # stage-4 bodies
]


def conv_s1(x, w, groups=1):
    return lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DIMS,
        feature_group_count=groups)


def check_equivalence():
    """Grouped conv over the concat == per-branch convs (same math; the
    backend may reassociate the k*k*C reduction, so tolerance is a few
    ulps of the output scale rather than 0)."""
    rng = np.random.default_rng(0)
    b, h, w_, c, n = 2, 16, 16, 8, 3
    xs = [jnp.asarray(rng.normal(size=(b, h, w_, c)).astype(np.float32))
          for _ in range(n)]
    ws = [jnp.asarray(rng.normal(size=(3, 3, c, c)).astype(np.float32))
          for _ in range(n)]
    sep = jnp.concatenate([conv_s1(x, w) for x, w in zip(xs, ws)], axis=-1)
    grp = conv_s1(jnp.concatenate(xs, axis=-1),
                  jnp.concatenate(ws, axis=-1), groups=n)
    err = float(jnp.max(jnp.abs(sep - grp)) / jnp.max(jnp.abs(sep)))
    assert err < 1e-5, f"grouped-conv equivalence broken: rel {err}"
    return err


R = int(os.environ.get("REPEATS", "10"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    B = args.batch
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    check_equivalence()
    rng = np.random.default_rng(0)
    z = jnp.zeros((8, 128), jnp.float32)
    floor = timed(jax.jit(lambda q: q + 1.0), z, 30)
    print(json.dumps({"dispatch_floor_ms": round(floor, 3),
                      "dtype": args.dtype, "batch": B}), flush=True)

    for tag, count, h, w_, c, n in CASES:
        x = jnp.asarray(rng.normal(size=(B, h, w_, n * c))).astype(dt)
        ws_sep = [jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.02).astype(dt)
                  for _ in range(n)]
        w_grp = jnp.concatenate(ws_sep, axis=-1)  # (3,3,C, N*C)
        blocks = np.zeros((3, 3, n * c, n * c), np.float32)
        for i, w in enumerate(ws_sep):
            blocks[:, :, i * c:(i + 1) * c, i * c:(i + 1) * c] = np.asarray(
                w, np.float32)
        w_dense = jnp.asarray(blocks).astype(dt)

        def sep_fn(xx, wlist):
            parts = jnp.split(xx, n, axis=-1)
            return jnp.concatenate(
                [conv_s1(p, w) for p, w in zip(parts, wlist)], axis=-1)

        variants = {
            "sep": (sep_fn, ws_sep),
            "grp": (lambda xx, ww: conv_s1(xx, ww, groups=n), w_grp),
            "dense": (lambda xx, ww: conv_s1(xx, ww), w_dense),
        }
        row = {"tag": tag, "count": count}
        gf = 2 * B * h * w_ * 9 * c * c * n / 1e9  # useful FLOPs (sep/grp)
        for name, (f, wgt) in variants.items():
            def fwd_chain(xx):
                for _ in range(R):
                    xx = jnp.tanh(f(xx, wgt))
                return xx

            def bwd_chain(carry):
                xx, ww = carry
                for _ in range(R):
                    gx, gw = jax.grad(
                        lambda q, r: jnp.sum(jnp.tanh(f(q, r))),
                        argnums=(0, 1))(xx, ww)
                    xx = xx - 0.001 * jnp.tanh(gx)
                    ww = jax.tree_util.tree_map(
                        lambda a, g: a - 0.001 * jnp.tanh(g), ww, gw)
                return xx, ww

            t_fwd = (timed(jax.jit(fwd_chain), x, args.iters) - floor) / R
            t_all = (timed(jax.jit(bwd_chain), (x, wgt), args.iters)
                     - floor) / R
            row[name] = {"fwd_ms": round(t_fwd, 3),
                         "fwdbwd_ms": round(t_all, 3),
                         "fwd_tflops": round(gf / t_fwd, 1),
                         "fwdbwd_tflops": round(3 * gf / t_all, 1)}
        for k in ("grp", "dense"):
            row[f"{k}_speedup_fwdbwd"] = round(
                row["sep"]["fwdbwd_ms"] / row[k]["fwdbwd_ms"], 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
