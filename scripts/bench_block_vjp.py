"""TPU probe: block-level fused custom VJP for the ResNet BasicBlock.

Escalation of the per-conv manual-dgrad experiments (PERF.md): wrapping
individual convs in custom_vjp was step-neutral (all-convs 0.973x,
narrow-only 0.994x) because the BN/ReLU glue that XLA fuses into the conv
backward sits OUTSIDE a per-conv boundary. Here the boundary contains the
whole BasicBlock (conv-bn-relu-conv-bn-add-relu): the backward is one
traced subgraph where the dgrads are expressed as plain forward convs
(kernel rotated 180, I/O swapped) and every glue gradient comes from
jax.vjp of the actual glue functions — XLA is free to fuse inside it.

If this wins at the stage-1 shape (64ch 128^2, the measured 1.7x-SOL
outlier), integrate behind a flag in models/components.BasicBlock and A/B
the full step. If it does not, the conclusion is that XLA's in-graph dgrad
lowering is NOT the bottleneck the isolation probes suggested, and the
remaining step-SOL gap is unreachable from model-level re-expression.

Usage: python scripts/bench_block_vjp.py [--iters 8] [--blocks 2]
"""

import argparse
import functools
import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))

import jax
import jax.numpy as jnp
from jax import lax

_DIMS = ("NHWC", "HWIO", "NHWC")
EPS = 1e-5


def conv(x, w):
    return lax.conv_general_dilated(x, w, (1, 1), ((1, 1), (1, 1)),
                                    dimension_numbers=_DIMS)


def conv_flip(dy, w):
    """dgrad of conv as a plain forward conv: rot180 + swap I/O."""
    wf = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)
    return lax.conv_general_dilated(dy, wf, (1, 1), ((1, 1), (1, 1)),
                                    dimension_numbers=_DIMS)


def wgrad(x, dy, w):
    _, vjp_w = jax.vjp(lambda ww: conv(x, ww), w)
    (dw,) = vjp_w(dy)
    return dw


def bn_relu(a, scale, bias):
    """Train-mode BN (single-pass batch stats, fp32) + ReLU."""
    af = a.astype(jnp.float32)
    mean = jnp.mean(af, axis=(0, 1, 2))
    var = jnp.maximum(jnp.mean(jnp.square(af), axis=(0, 1, 2))
                      - jnp.square(mean), 0.0)
    inv = lax.rsqrt(var + EPS) * scale
    y = (a - mean.astype(a.dtype)) * inv.astype(a.dtype) + bias.astype(a.dtype)
    return jnp.maximum(y, 0)


def bn_add_relu(a, scale, bias, res):
    af = a.astype(jnp.float32)
    mean = jnp.mean(af, axis=(0, 1, 2))
    var = jnp.maximum(jnp.mean(jnp.square(af), axis=(0, 1, 2))
                      - jnp.square(mean), 0.0)
    inv = lax.rsqrt(var + EPS) * scale
    y = (a - mean.astype(a.dtype)) * inv.astype(a.dtype) + bias.astype(a.dtype)
    return jnp.maximum(y + res, 0)


def conv1x1(x, w):
    return lax.conv_general_dilated(x, w, (1, 1), ((0, 0), (0, 0)),
                                    dimension_numbers=_DIMS)


def block_ref(p, x):
    """Plain autodiff BasicBlock (stage-1 body: no downsample, scale=1)."""
    a1 = conv(x, p["w1"])
    z1 = bn_relu(a1, p["g1"], p["b1"])
    a2 = conv(z1, p["w2"])
    return bn_add_relu(a2, p["g2"], p["b2"], x)


def bn_only(a, scale, bias):
    af = a.astype(jnp.float32)
    mean = jnp.mean(af, axis=(0, 1, 2))
    var = jnp.maximum(jnp.mean(jnp.square(af), axis=(0, 1, 2))
                      - jnp.square(mean), 0.0)
    inv = lax.rsqrt(var + EPS) * scale
    return (a - mean.astype(a.dtype)) * inv.astype(a.dtype) + bias.astype(a.dtype)


def block_ds_ref(p, x):
    """BasicBlock with a stride-1 1x1 downsample (stage-1 first block)."""
    a1 = conv(x, p["w1"])
    z1 = bn_relu(a1, p["g1"], p["b1"])
    a2 = conv(z1, p["w2"])
    res = bn_only(conv1x1(x, p["wd"]), p["gd"], p["bd"])
    return bn_add_relu(a2, p["g2"], p["b2"], res)


@jax.custom_vjp
def block_ds_fused(p, x):
    return block_ds_ref(p, x)


def _block_ds_fwd(p, x):
    a1 = conv(x, p["w1"])
    z1 = bn_relu(a1, p["g1"], p["b1"])
    a2 = conv(z1, p["w2"])
    ad = conv1x1(x, p["wd"])
    out = bn_add_relu(a2, p["g2"], p["b2"],
                      bn_only(ad, p["gd"], p["bd"]))
    return out, (p, x, a1, z1, a2, ad)


def _block_ds_bwd(res, dout):
    p, x, a1, z1, a2, ad = res
    _, vjp2 = jax.vjp(
        lambda a, g, b, adp, gd, bd: bn_add_relu(
            a, g, b, bn_only(adp, gd, bd)),
        a2, p["g2"], p["b2"], ad, p["gd"], p["bd"])
    da2, dg2, db2, dad, dgd, dbd = vjp2(dout)
    dz1 = conv_flip(da2, p["w2"])
    dw2 = wgrad(z1, da2, p["w2"])
    _, vjp1 = jax.vjp(lambda a, g, b: bn_relu(a, g, b), a1, p["g1"], p["b1"])
    da1, dg1, db1 = vjp1(dz1)
    # 1x1 dgrad: flip of a 1x1 kernel is itself; just swap I/O
    dx = (conv_flip(da1, p["w1"])
          + conv1x1(dad, p["wd"].transpose(0, 1, 3, 2)))
    dw1 = wgrad(x, da1, p["w1"])
    _, vjp_wd = jax.vjp(lambda ww: conv1x1(x, ww), p["wd"])
    (dwd,) = vjp_wd(dad)
    dp = {"w1": dw1, "g1": dg1, "b1": db1, "w2": dw2, "g2": dg2, "b2": db2,
          "wd": dwd, "gd": dgd, "bd": dbd}
    return dp, dx


block_ds_fused.defvjp(_block_ds_fwd, _block_ds_bwd)


def unit_ref(p, x):
    """Basic2d unit: conv3x3 + BN + ReLU (stems/generator/conv0 pattern)."""
    return bn_relu(conv(x, p["w1"]), p["g1"], p["b1"])


@jax.custom_vjp
def unit_fused(p, x):
    return unit_ref(p, x)


def _unit_fwd(p, x):
    a1 = conv(x, p["w1"])
    return bn_relu(a1, p["g1"], p["b1"]), (p, x, a1)


def _unit_bwd(res, dout):
    p, x, a1 = res
    _, vjp1 = jax.vjp(lambda a, g, b: bn_relu(a, g, b), a1, p["g1"], p["b1"])
    da1, dg1, db1 = vjp1(dout)
    dx = conv_flip(da1, p["w1"])
    dw1 = wgrad(x, da1, p["w1"])
    return {"w1": dw1, "g1": dg1, "b1": db1}, dx


unit_fused.defvjp(_unit_fwd, _unit_bwd)


@jax.custom_vjp
def block_fused(p, x):
    return block_ref(p, x)


def _block_fwd(p, x):
    a1 = conv(x, p["w1"])
    z1 = bn_relu(a1, p["g1"], p["b1"])
    a2 = conv(z1, p["w2"])
    out = bn_add_relu(a2, p["g2"], p["b2"], x)
    return out, (p, x, a1, z1, a2)


def _block_bwd(res, dout):
    p, x, a1, z1, a2 = res
    # glue2: bn2 + residual add + relu
    _, vjp2 = jax.vjp(
        lambda a, g, b, r: bn_add_relu(a, g, b, r), a2, p["g2"], p["b2"], x)
    da2, dg2, db2, dres = vjp2(dout)
    dz1 = conv_flip(da2, p["w2"])
    dw2 = wgrad(z1, da2, p["w2"])
    # glue1: bn1 + relu
    _, vjp1 = jax.vjp(lambda a, g, b: bn_relu(a, g, b), a1, p["g1"], p["b1"])
    da1, dg1, db1 = vjp1(dz1)
    dx = conv_flip(da1, p["w1"]) + dres
    dw1 = wgrad(x, da1, p["w1"])
    dp = {"w1": dw1, "g1": dg1, "b1": db1, "w2": dw2, "g2": dg2, "b2": db2}
    return dp, dx


block_fused.defvjp(_block_fwd, _block_bwd)


def make_params(kind, ch, n_blocks, dtype):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3 * n_blocks + 1)
    params = []
    for i in range(n_blocks):
        p = {"w1": jax.random.normal(ks[3 * i], (3, 3, ch, ch), dtype) * 0.05,
             "g1": jnp.ones((ch,), jnp.float32),
             "b1": jnp.zeros((ch,), jnp.float32)}
        if kind in ("block", "block_ds"):
            p.update({
                "w2": jax.random.normal(ks[3 * i + 1], (3, 3, ch, ch),
                                        dtype) * 0.05,
                "g2": jnp.ones((ch,), jnp.float32),
                "b2": jnp.zeros((ch,), jnp.float32)})
        if kind == "block_ds":
            p.update({
                "wd": jax.random.normal(ks[3 * i + 2], (1, 1, ch, ch),
                                        dtype) * 0.1,
                "gd": jnp.ones((ch,), jnp.float32),
                "bd": jnp.zeros((ch,), jnp.float32)})
        params.append(p)
    return params, ks[-1]


def make_chain(block, n_blocks, params):
    def loss(ps, x):
        for p in ps:
            x = block(p, x)
        return jnp.sum(x.astype(jnp.float32) ** 2)

    grad = jax.grad(loss, argnums=(0, 1))

    @jax.jit
    def step(ps, x):
        gps, gx = grad(ps, x)
        # chain: feed the input gradient back as the next input (keeps the
        # device strictly sequential; one scalar fetch syncs)
        nx = jnp.clip(x + 1e-3 * gx.astype(x.dtype), -3, 3)
        return nx, gps[0]["w1"][0, 0, 0, 0]

    return step


def measure(block, kind, n_blocks, batch, ch, hw, dtype, iters, warmup=2,
            trials=3):
    params, xkey = make_params(kind, ch, n_blocks, dtype)
    x = jax.random.normal(xkey, (batch, hw, hw, ch), dtype)
    step = make_chain(block, n_blocks, params)
    t0 = time.perf_counter()
    nx, s = step(params, x)
    float(s)
    compile_s = time.perf_counter() - t0
    for _ in range(warmup):
        nx, s = step(params, nx)
    float(s)
    best = None
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            nx, s = step(params, nx)
        float(s)
        ms = (time.perf_counter() - t0) / iters * 1e3
        best = ms if best is None else min(best, ms)
    return best, compile_s


PAIRS = {"block": (block_ref, block_fused),
         "block_ds": (block_ds_ref, block_ds_fused),
         "unit": (unit_ref, unit_fused)}


def check_exact(kind, batch=2, ch=8, hw=16):
    ref, fused = PAIRS[kind]
    (p,), xkey = make_params(kind, ch, 1, jnp.float32)
    p = {k: (v * 1.3 + 0.01 if v.ndim == 1 else v) for k, v in p.items()}
    x = jax.random.normal(xkey, (batch, hw, hw, ch))

    def loss(block, p, x):
        return jnp.sum(block(p, x) ** 2)

    g_ref = jax.grad(functools.partial(loss, ref), argnums=(0, 1))(p, x)
    g_fus = jax.grad(functools.partial(loss, fused), argnums=(0, 1))(p, x)
    err = max(float(jnp.max(jnp.abs(a - b)))
              for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fus)))
    return err


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--blocks", type=int, default=2)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    print(f"# backend: {jax.default_backend()}", file=sys.stderr)
    for kind in PAIRS:
        err = check_exact(kind)
        print(json.dumps({"kind": kind, "grad_agreement_max_abs": err}),
              flush=True)

    # (kind, ch, hw, dtype): the four JSPSR stage shapes in the bf16 body,
    # the stage-1 downsample block, the Basic2d unit pattern, and the fp32
    # stage-1 control.
    cases = [("block", 64, 128, jnp.bfloat16),
             ("block", 128, 64, jnp.bfloat16),
             ("block", 256, 32, jnp.bfloat16),
             ("block", 512, 16, jnp.bfloat16),
             ("block_ds", 64, 128, jnp.bfloat16),
             ("unit", 64, 128, jnp.bfloat16),
             ("block", 64, 128, jnp.float32)]
    for kind, ch, hw, dtype in cases:
        ref, fused = PAIRS[kind]
        n = args.blocks * (2 if kind == "unit" else 1)
        out = {"kind": kind, "ch": ch, "dtype": jnp.dtype(dtype).name,
               "batch": args.batch, "hw": hw, "blocks": n}
        for name, blk in (("autodiff", ref), ("fused_vjp", fused)):
            ms, cs = measure(blk, kind, n, args.batch, ch, hw,
                             dtype, args.iters)
            out[name] = {"ms": round(ms, 2), "compile_s": round(cs, 1)}
        out["speedup"] = round(out["autodiff"]["ms"] / out["fused_vjp"]["ms"], 4)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
