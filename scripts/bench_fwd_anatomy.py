"""TPU probe: IN-MODEL forward section anatomy (round-2 VERDICT #2).

bench_fwd_sol measures ops in isolation (inflated by per-launch overhead and
missing XLA's in-model fusion); this times CUMULATIVE prefixes of the real
flagship forward — stems, each encoder stage, decoder, conv0, SPN generator,
full — in ONE process with chained inputs, so the deltas are the true
in-model section costs.

The orchestration below mirrors JSPSR.__call__ (models/jspsr.py:225-323);
keep in sync if the model changes.

Usage: python scripts/bench_fwd_anatomy.py [--dtype bfloat16] [--batch 16]
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


def make_prefix_fn(model, params, state, stop: str, cdt):
    """Forward running only up to ``stop``; returns a (B,) reduction so every
    chained iteration depends on all computed work."""

    def fwd(dem, img, msk):
        def run(name, *args):
            mod = getattr(model, name)
            out, _ = mod(params.get(name, {}), state.get(name, {}), *args,
                         train=False)
            return out

        feats = {"dem": run("conv_dem", dem.astype(cdt)),
                 "img": run("conv_img", img.astype(cdt)),
                 "aux": run("conv_aux", msk.astype(cdt))}
        if stop == "stems":
            return sum(jnp.mean(v, axis=(1, 2, 3)) for v in feats.values())
        fused = {}
        dem_in = feats["dem"]
        for s in range(1, 5):
            branch = {"dem": run(f"layer{s}_dem", dem_in),
                      "img": run(f"layer{s}_img", feats["img"]),
                      "aux": run(f"layer{s}_aux", feats["aux"])}
            fused[s] = run(f"guide{s}", [branch["dem"], branch["img"],
                                         branch["aux"]])
            feats = branch
            dem_in = fused[s]
            if stop == f"enc{s}":
                return jnp.mean(fused[s], axis=(1, 2, 3))
        def skip(dc, fu):
            return (jnp.concatenate([dc, fu], axis=-1) if model.cat_only
                    else dc + fu)

        dc3 = run("layer3d", fused[4])
        dc2 = run("layer2d", skip(dc3, fused[3]))
        dc1 = run("layer1d", skip(dc2, fused[2]))
        if stop == "dec":
            return jnp.mean(dc1, axis=(1, 2, 3))
        c0 = run("conv0", skip(dc1, fused[1]))
        if stop == "conv0":
            return jnp.mean(c0, axis=(1, 2, 3))
        dem_sg = jax.lax.stop_gradient(dem)
        (weight, offset), _ = model.generator(
            params["generator"], state.get("generator", {}),
            dem_sg.astype(cdt), c0, train=False)
        if stop == "gen":
            return (jnp.mean(weight, axis=(1, 2, 3))
                    + jnp.mean(offset, axis=(1, 2, 3)))
        out, _ = model.postprocessor(
            params["postprocessor"], {}, dem_sg,
            weight.astype(jnp.float32), offset.astype(jnp.float32),
            train=False)
        return jnp.mean(out, axis=(1, 2, 3))

    return fwd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import __graft_entry__ as g

    kw = {"compute_dtype": args.dtype} if args.dtype != "float32" else {}
    model, params, state = g._flagship(**kw)
    cdt = model.compute_dtype
    dem, img, msk = g._example_inputs(args.batch, 128, 128)

    stops = ["stems", "enc1", "enc2", "enc3", "enc4", "dec", "conv0",
             "gen", "full"]
    times = {}
    for stop in stops:
        f = make_prefix_fn(model, params, state, stop, cdt)

        def chain(d, i, m):
            r = f(d, i, m)
            # r feeds back so iterations are sequential on device
            return jnp.clip(d + (1e-20 * r)[:, None, None, None], 0.05, 0.95)

        jfn = jax.jit(chain)
        d = dem
        for _ in range(3):
            d = jfn(d, img, msk)
        float(d[0, 0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            d = jfn(d, img, msk)
        float(d[0, 0, 0, 0])
        times[stop] = (time.perf_counter() - t0) / args.iters * 1e3
        print(json.dumps({"stop": stop,
                          "cum_ms": round(times[stop], 3)}), flush=True)

    deltas = {}
    prev = 0.0
    for stop in stops:
        deltas[stop] = round(times[stop] - prev, 3)
        prev = times[stop]
    print(json.dumps({"deltas_ms": deltas,
                      "full_ms": round(times["full"], 3),
                      "batch": args.batch, "dtype": args.dtype}), flush=True)


if __name__ == "__main__":
    main()
