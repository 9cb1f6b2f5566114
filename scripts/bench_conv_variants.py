"""TPU probe: candidate rewrites for the slow full-res narrow-channel convs.

bench_fwd_anatomy puts ~60% of the bf16 forward in stems + encoder stage 1
(128^2, 32-64 channels); bench_fwd_sol shows the 64-ch 3x3 conv running at
~16% of MXU peak while the 128-ch version hits ~47% — consistent with lane
padding of sub-128 channel counts. This probes exact-arithmetic rewrites:

  sep3     three separate 64->64 convs (model baseline for one stage row)
  blockdiag one dense 192->192 conv with block-diagonal weights (exact)
  grouped  one conv with feature_group_count=3 (exact, same FLOPs as sep3)
  batchg   batch_group_count=3 with branch folded into batch (exact)
  s2d      space-to-depth: 2x2 conv over (64^2, 256) per branch (exact
           rewrite of 3x3 s1 via parity decomposition; 16/9 FLOPs)
  wide128 / in128 / out128: channel-width controls for locating the penalty

Chained timing, one process. Usage: python scripts/bench_conv_variants.py
"""

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
from jax import lax

DIMS = ("NHWC", "HWIO", "NHWC")
B, H, W, C = 16, 128, 128, 64
DT = jnp.bfloat16


def timed(fn, x, iters=20, warmup=3):
    s = x
    for _ in range(warmup):
        s = fn(s)
    float(jnp.ravel(s)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(s)
    float(jnp.ravel(s)[0])
    return 1e3 * (time.perf_counter() - t0) / iters


def conv(x, w, stride=1, pad=1, groups=1, batch_groups=1, k=3):
    return lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=DIMS, feature_group_count=groups,
        batch_group_count=batch_groups)


def main():
    rng = np.random.default_rng(0)
    R = 8  # in-jit repeats

    def w_(shape, scale=0.05):
        return jnp.asarray(rng.normal(size=shape) * scale).astype(DT)

    x3 = [jnp.asarray(rng.normal(size=(B, H, W, C))).astype(DT)
          for _ in range(3)]
    w3 = [w_((3, 3, C, C)) for _ in range(3)]

    results = {}

    # --- sep3: three separate convs (the model's current form) -----------
    def sep3(xx):
        for _ in range(R):
            ys = [jnp.tanh(conv(xx[..., i * C:(i + 1) * C], w3[i]))
                  for i in range(3)]
            xx = jnp.concatenate(ys, axis=-1)
        return xx

    xcat = jnp.concatenate(x3, axis=-1)  # (B, H, W, 3C)
    results["sep3"] = timed(jax.jit(sep3), xcat) / R

    # --- blockdiag: one dense 192->192 conv, weights block-diagonal ------
    wbd = jnp.zeros((3, 3, 3 * C, 3 * C), DT)
    for i in range(3):
        wbd = wbd.at[:, :, i * C:(i + 1) * C, i * C:(i + 1) * C].set(w3[i])

    def blockdiag(xx):
        for _ in range(R):
            xx = jnp.tanh(conv(xx, wbd))
        return xx

    results["blockdiag"] = timed(jax.jit(blockdiag), xcat) / R

    # --- grouped: feature_group_count=3 ---------------------------------
    wg = jnp.concatenate(w3, axis=-1)  # (3,3,C,3C) grouped layout

    def grouped(xx):
        for _ in range(R):
            xx = jnp.tanh(conv(xx, wg, groups=3))
        return xx

    results["grouped"] = timed(jax.jit(grouped), xcat) / R

    # --- batchg: fold branch into batch, batch_group_count=3 ------------
    xb = jnp.concatenate(x3, axis=0)  # (3B, H, W, C)

    def batchg(xx):
        for _ in range(R):
            y = conv(xx, wg, batch_groups=3)  # (3B,H,W,3C)? -> N stays
            # batch_group_count output: (B, H, W, 3C); fold back
            y = jnp.concatenate(jnp.split(y, 3, axis=-1), axis=0)
            xx = jnp.tanh(y)
        return xx

    try:
        results["batchg"] = timed(jax.jit(batchg), xb) / R
    except Exception as e:
        results["batchg"] = f"failed: {e}"[:80]

    # --- s2d: exact 3x3 s1 conv in space-to-depth form -------------------
    # y[2i+p, 2j+q] needs x rows 2i+p-1..2i+p+1 -> parity blocks i-1..i+1;
    # build the equivalent 3x3 conv over (H/2, W/2, 4C) -> (.., 4C): each
    # (out-parity, in-parity) tap maps to one original tap or zero.
    w4 = jnp.zeros((3, 3, 4 * C, 4 * C), DT)
    for po in range(2):      # output parity (y row)
        for qo in range(2):
            for pi in range(2):   # input parity
                for qi in range(2):
                    for dy in (-1, 0, 1):
                        for dx in (-1, 0, 1):
                            # original tap (dy,dx): y[2i+po] reads
                            # x[2i+po+dy] = row block 2(i+u)+pi with
                            # 2u+pi = po+dy
                            uy2 = po + dy - pi
                            ux2 = qo + dx - qi
                            if uy2 % 2 or ux2 % 2:
                                continue
                            uy, ux = uy2 // 2, ux2 // 2
                            if abs(uy) > 1 or abs(ux) > 1:
                                continue
                            oc = (2 * po + qo) * C
                            ic = (2 * pi + qi) * C
                            w4 = w4.at[uy + 1, ux + 1,
                                       ic:ic + C, oc:oc + C].set(
                                w3[0][dy + 1, dx + 1])
    xs2d = x3[0].reshape(B, H // 2, 2, W // 2, 2, C).transpose(
        0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)

    def s2d(xx):
        for _ in range(R):
            xx = jnp.tanh(conv(xx, w4))
        return xx

    results["s2d_1branch"] = timed(jax.jit(s2d), xs2d) / R

    # correctness of the s2d rewrite
    y_ref = conv(x3[0], w3[0])
    y_s2d = conv(xs2d, w4)
    y_s2d = y_s2d.reshape(B, H // 2, W // 2, 2, 2, C).transpose(
        0, 1, 3, 2, 4, 5).reshape(B, H, W, C)
    err = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)
                                - y_s2d.astype(jnp.float32))))
    results["s2d_max_err"] = err

    # --- channel-width controls -----------------------------------------
    for tag, cin, cout in (("c64_64", 64, 64), ("c64_128", 64, 128),
                           ("c128_64", 128, 64), ("c128_128", 128, 128),
                           ("c192_192", 192, 192), ("c256_256", 256, 256)):
        xx0 = jnp.asarray(rng.normal(size=(B, H, W, cin))).astype(DT)
        ww = w_((3, 3, cin, cout))
        proj = w_((cout, cin), 0.02)

        def ctrl(xx):
            for _ in range(R):
                xx = jnp.tanh(jnp.einsum("bhwo,oc->bhwc", conv(xx, ww), proj))
            return xx

        t = timed(jax.jit(ctrl), xx0) / R
        gf = 2 * B * H * W * 9 * cin * cout / 1e9
        results[tag] = {"ms": round(t, 3), "tflops": round(gf / t, 1)}

    # single-branch baseline for s2d comparison
    def one(xx):
        for _ in range(R):
            xx = jnp.tanh(conv(xx, w3[0]))
        return xx

    results["sep1"] = timed(jax.jit(one), x3[0]) / R

    for k, v in results.items():
        if isinstance(v, float):
            results[k] = round(v, 3)
    print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
