"""TPU probe: per-op forward vs backward efficiency breakdown.

PERF.md established that the flagship train step runs the backward at
roughly HALF the forward's MXU efficiency (fwd 13.6 ms / 99 TFLOP/s vs
step 98.6 ms => fwd+bwd ~41-45 TFLOP/s at fwd+bwd = 3.01x fwd FLOPs).
This probe locates the loss: it measures fwd and fwd+bwd time for every
distinct heavy op shape in the flagship JSPSR 3-branch model (b16, 128^2,
nf=32, cat_only) and prints measured TFLOP/s per category.

Categories: stride-1 3x3 convs (the FLOP bulk), stride-2 3x3 stage-entry
convs, 1x1 stride-2 downsamples, decoder ConvTranspose (lhs-dilated), the
BN layers, and the SPN generator convs. Chained-measurement protocol
(PERF.md): each iteration's input depends on the previous output; one
scalar fetch at the end is the only sync.
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
B = 16

# (tag, count_in_model, H, W, Cin, Cout, kind)
# kind: s1 = 3x3 stride-1 same; s2 = 3x3 stride-2 same; ds = 1x1 stride-2;
#       ct = ConvTranspose k3 s2 op1 (H,W are the INPUT res); s5 = 5x5 s1.
SHAPES = [
    # stems (5x5): tiny FLOPs but Cin=1/3/15 is MXU-hostile
    ("stem_dem", 1, 128, 128, 1, 64, "s5"),
    ("stem_img", 1, 128, 128, 3, 64, "s5"),
    ("stem_msk", 1, 128, 128, 15, 64, "s5"),
    # stage1: 3 branches x 2 blocks x 2 convs
    ("s1_64x128", 12, 128, 128, 64, 64, "s1"),
    # stage2 entries
    ("s2_dem", 1, 128, 128, 192, 128, "s2"),
    ("s2_img", 2, 128, 128, 64, 128, "s2"),
    ("ds2_dem", 1, 128, 128, 192, 128, "ds"),
    ("ds2_img", 2, 128, 128, 64, 128, "ds"),
    ("s1_128x64", 9, 64, 64, 128, 128, "s1"),
    # stage3
    ("s3_dem", 1, 64, 64, 512, 256, "s2"),
    ("s3_img", 2, 64, 64, 128, 256, "s2"),
    ("ds3_dem", 1, 64, 64, 512, 256, "ds"),
    ("ds3_img", 2, 64, 64, 128, 256, "ds"),
    ("s1_256x32", 9, 32, 32, 256, 256, "s1"),
    # stage4
    ("s4_dem", 1, 32, 32, 1024, 512, "s2"),
    ("s4_img", 2, 32, 32, 256, 512, "s2"),
    ("ds4_dem", 1, 32, 32, 1024, 512, "ds"),
    ("ds4_img", 2, 32, 32, 256, 512, "ds"),
    ("s1_512x16", 9, 16, 16, 512, 512, "s1"),
    # decoder
    ("dec3_conv", 1, 16, 16, 1536, 256, "s1"),
    ("dec3_ct", 1, 16, 16, 256, 256, "ct"),
    ("dec2_conv", 1, 32, 32, 1024, 128, "s1"),
    ("dec2_ct", 1, 32, 32, 128, 128, "ct"),
    ("dec1_conv", 1, 64, 64, 512, 64, "s1"),
    ("dec1_ct", 1, 64, 64, 64, 64, "ct"),
    ("conv0", 1, 128, 128, 256, 64, "s1"),
    # SPN generator bulk (conv + 2 block convs at 128ch, 3x 64ch convs)
    ("spn_64x128", 3, 128, 128, 64, 64, "s1"),
    ("spn_128x128", 3, 128, 128, 128, 128, "s1"),
]


def make_fn(kind, cin, cout):
    if kind == "s1":
        return lambda x, w: lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DIMS)
    if kind == "s5":
        return lambda x, w: lax.conv_general_dilated(
            x, w, (1, 1), ((2, 2), (2, 2)), dimension_numbers=DIMS)
    if kind == "s2":
        return lambda x, w: lax.conv_general_dilated(
            x, w, (2, 2), ((1, 1), (1, 1)), dimension_numbers=DIMS)
    if kind == "ds":
        return lambda x, w: lax.conv_general_dilated(
            x, w, (2, 2), ((0, 0), (0, 0)), dimension_numbers=DIMS)
    if kind == "ct":
        return lambda x, w: lax.conv_general_dilated(
            x, w, (1, 1), ((1, 2), (1, 2)), lhs_dilation=(2, 2),
            dimension_numbers=DIMS)
    raise ValueError(kind)


def kshape(kind, cin, cout):
    k = {"s1": 3, "s2": 3, "ds": 1, "ct": 3, "s5": 5}[kind]
    return (k, k, cin, cout)


def out_hw(kind, h, w):
    if kind in ("s1", "s5"):
        return h, w
    if kind in ("s2", "ds"):
        return h // 2, w // 2
    return 2 * h, 2 * w  # ct


def gflops_fwd(kind, h, w, cin, cout):
    oh, ow = out_hw(kind, h, w)
    k = {"s1": 3, "s2": 3, "ds": 1, "ct": 3, "s5": 5}[kind]
    return 2 * B * oh * ow * k * k * cin * cout / 1e9


R = int(os.environ.get("REPEATS", "10"))  # in-jit repeats: amortize the
# ~2 ms per-launch tunnel dispatch floor (v1 of this probe was swamped by it)


def timed(fn, chain, iters, warmup=2):
    s = chain
    for _ in range(warmup):
        s = fn(s)
    float(jnp.ravel(jax.tree_util.tree_leaves(s)[0])[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(s)
    float(jnp.ravel(jax.tree_util.tree_leaves(s)[0])[0])
    return 1000 * (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    iters = int(os.environ.get("ITERS", "10"))
    rows = []

    # measure the per-launch dispatch floor with a trivial program
    z = jnp.zeros((8, 128), jnp.float32)
    floor = timed(jax.jit(lambda q: q + 1.0), z, 30)
    print(json.dumps({"dispatch_floor_ms": round(floor, 3)}), flush=True)

    for tag, count, h, w_, cin, cout, kind in SHAPES:
        f = make_fn(kind, cin, cout)
        x = jnp.asarray(rng.normal(size=(B, h, w_, cin)).astype(np.float32))
        wgt = jnp.asarray((rng.normal(size=kshape(kind, cin, cout)) * 0.02)
                          .astype(np.float32))
        gf = gflops_fwd(kind, h, w_, cin, cout)

        # feed output back to input shape via cheap resize+1x1 projection
        proj = jnp.asarray((rng.normal(size=(cout, cin)) * 0.01)
                           .astype(np.float32))
        oh, ow = out_hw(kind, h, w_)

        def back_to_x(y):
            y2 = jnp.einsum("bhwo,oc->bhwc", y, proj)
            if (oh, ow) != (h, w_):
                if oh < h:  # upsample back
                    y2 = jnp.repeat(jnp.repeat(y2, h // oh, 1), w_ // ow, 2)
                else:
                    y2 = y2[:, :: oh // h, :: ow // w_, :]
            return jnp.tanh(y2)

        def fwd_chain(xx):
            for _ in range(R):
                xx = back_to_x(f(xx, wgt))
            return xx

        t_fwd = (timed(jax.jit(fwd_chain), x, iters) - floor) / R

        def bwd_chain(carry):
            xx, ww = carry
            for _ in range(R):
                gx, gw = jax.grad(lambda q, r: jnp.sum(jnp.tanh(f(q, r))),
                                  argnums=(0, 1))(xx, ww)
                xx = xx - 0.001 * jnp.tanh(gx)
                ww = ww - 0.001 * jnp.tanh(gw)
            return xx, ww

        t_all = (timed(jax.jit(bwd_chain), (x, wgt), iters) - floor) / R
        t_bwd = t_all - t_fwd
        rows.append({
            "tag": tag, "kind": kind, "count": count, "gflop": round(gf, 2),
            "fwd_ms": round(t_fwd, 3), "fwdbwd_ms": round(t_all, 3),
            "fwd_tflops": round(gf / t_fwd, 1),
            "bwd_tflops": round(2 * gf / max(t_bwd, 1e-6), 1),
            "model_fwd_ms": round(count * t_fwd, 2),
            "model_bwd_ms": round(count * t_bwd, 2),
        })
        print(json.dumps(rows[-1]), flush=True)

    tot_f = sum(r["model_fwd_ms"] for r in rows)
    tot_b = sum(r["model_bwd_ms"] for r in rows)
    print(json.dumps({"sum_model_fwd_ms": round(tot_f, 1),
                      "sum_model_bwd_ms": round(tot_b, 1)}), flush=True)


if __name__ == "__main__":
    main()
