"""TPU probe: can a Pallas im2col-in-VMEM conv beat XLA's lowering at the
MXU-hostile 64-channel full-resolution shapes?

Motivation (PERF.md "train-step speed of light"): the narrow stride-1
convs (stage-1 body, SPN generator) measure ~42 TF/s bf16 — ~86 % of a
PER-TAP padded ceiling (K=C=64 pads to 128 lanes -> 25 % of peak). An
im2col contraction folds all 9 taps into K=9*64=576 (pads to 640, 90 %
K-fill), raising the padded ceiling to ~88 TF/s (N=64 still pads to 128).
This kernel materializes the im2col patches ONLY in VMEM, one (bh, W)
row-block at a time, so HBM traffic stays at the direct-conv level (the
XLA-level im2col wgrad experiment was HBM-bound and lost 3x).

Decision rule (PERF.md lesson): an op-level win below ~1.3x does not ship;
anything above gets a step-level A/B before changing any default.
"""

import json
import os
import sys
import time
from functools import partial
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DIMS = ("NHWC", "HWIO", "NHWC")


def _kernel(bh, w, cin, cout, kk):
    """One program: rows [i*bh, i*bh+bh) of one image. The padded image
    lives in VMEM once per batch element (the BlockSpec index map is
    constant in the row axis, so the pipeline skips the re-fetch); the
    (bh*W, kk*kk*Cin) patch matrix exists only in VMEM."""

    def kernel(x_ref, w_ref, out_ref, pm_ref):
        i = pl.program_id(1)
        # build the (bh*W, kk*kk*Cin) patch matrix in VMEM scratch: per-tap
        # stores force the relayout Mosaic cannot express as a lane-concat
        # of shift-offset slices ("offset mismatch on non-concat dimension")
        for dy in range(kk):
            for dx in range(kk):
                t = dy * kk + dx
                tap = x_ref[0, pl.ds(i * bh + dy, bh), pl.ds(dx, w), :]
                pm_ref[:, t * cin:(t + 1) * cin] = tap.reshape(bh * w, cin)
        out = jnp.dot(pm_ref[:], w_ref[...],
                      preferred_element_type=jnp.float32)
        out_ref[0] = out.reshape(bh, w, cout).astype(out_ref.dtype)

    return kernel


@partial(jax.jit, static_argnames=("bh", "kk"))
def pallas_conv_same(x, w, bh: int = 8, kk: int = 3):
    """3x3 (or kk x kk) stride-1 'same' conv, NHWC/HWIO, im2col in VMEM."""
    b, h, wd, cin = x.shape
    assert w.shape[:2] == (kk, kk) and w.shape[2] == cin
    cout = w.shape[3]
    pad = kk // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    wm = w.reshape(kk * kk * cin, cout)
    nb = h // bh
    return pl.pallas_call(
        _kernel(bh, wd, cin, cout, kk),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, h + 2 * pad, wd + 2 * pad, cin),
                         lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kk * kk * cin, cout), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, wd, cout), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((bh * wd, kk * kk * cin), x.dtype)],
        interpret=jax.default_backend() == "cpu",
    )(xp, wm)


def xla_conv(x, w):
    return lax.conv_general_dilated(x, w, (1, 1),
                                    [(w.shape[0] // 2,) * 2,
                                     (w.shape[1] // 2,) * 2],
                                    dimension_numbers=_DIMS)


def timed(name, fn, x0, iters, trials=3, warmup=2, flops=None):
    """Chained: each iteration feeds the previous output's clip back in."""
    s = x0
    for _ in range(warmup):
        s = fn(s)
    float(jnp.ravel(s)[0])
    best = None
    for _ in range(trials):
        s0 = s
        t0 = time.perf_counter()
        for _ in range(iters):
            s0 = fn(s0)
        float(jnp.ravel(s0)[0])
        ms = 1000 * (time.perf_counter() - t0) / iters
        best = ms if best is None else min(best, ms)
    tf = (flops / best / 1e9) if flops else None
    print(json.dumps({"case": name, "ms": round(best, 3),
                      "tflops": round(tf, 1) if tf else None}), flush=True)
    return best


def main():
    cases = [
        # (tag, B, H, W, Cin, Cout, kk, dtype)
        ("stage1_64ch_bf16", 16, 128, 128, 64, 64, 3, jnp.bfloat16),
        ("stage1_64ch_fp32", 16, 128, 128, 64, 64, 3, jnp.float32),
        ("gen_32to64_bf16", 16, 128, 128, 32, 64, 3, jnp.bfloat16),
        ("gen_64to32_bf16", 16, 128, 128, 64, 32, 3, jnp.bfloat16),
    ]
    rng = np.random.default_rng(0)
    for tag, b, h, wd, cin, cout, kk, dt in cases:
        x = jnp.asarray(rng.normal(0, 1, (b, h, wd, cin)), dt)
        w1 = jnp.asarray(rng.normal(0, 0.05, (kk, kk, cin, cout)), dt)
        # feed-back needs matching channel count: project back with a 1x1
        wb = jnp.asarray(rng.normal(0, 0.05, (1, 1, cout, cin)), dt)
        flops = 2 * b * h * wd * kk * kk * cin * cout

        # numerics first (fp32 reference)
        ref = xla_conv(x.astype(jnp.float32), w1.astype(jnp.float32))
        for bh in (8, 16, 32):
            got = pallas_conv_same(x, w1, bh=bh).astype(jnp.float32)
            err = float(jnp.max(jnp.abs(got - ref)))
            scale = float(jnp.max(jnp.abs(ref)))
            tol = 0.03 if dt == jnp.bfloat16 else 1e-4
            assert err <= tol * max(scale, 1.0), (tag, bh, err, scale)

        def chain_x(f):
            def g(s):
                y = f(s, w1)
                return jnp.tanh(xla_conv(y, wb))
            return jax.jit(g)

        timed(f"xla_{tag}", chain_x(xla_conv), x, 30, flops=flops)
        for bh in (8, 16, 32):
            timed(f"pallas_bh{bh}_{tag}",
                  chain_x(partial(pallas_conv_same, bh=bh)), x, 30,
                  flops=flops)


if __name__ == "__main__":
    main()
