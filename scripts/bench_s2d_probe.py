"""TPU probe: stride-2 conv vs its space-to-depth re-expression.

Hypothesis (PERF.md): backward conv efficiency is ~half of forward because
stride-2 conv data-gradients lower as 4x-zero-stuffed dilated convs on the
MXU. The space-to-depth form computes the SAME function as a dense stride-1
2x2 conv over 4C channels (dense in both directions) at +78% nominal FLOPs.

Measures fwd and fwd+bwd for both forms on representative JSPSR encoder
shapes, and checks numerical equality on device.
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


def conv_s2(x, w):
    return lax.conv_general_dilated(x, w, (2, 2), ((1, 1), (1, 1)),
                                    dimension_numbers=DIMS)


def conv_s2_std(x, w):
    """Space-to-depth re-expression of stride-2 3x3 'same' conv (exact)."""
    b, h, w_, c = x.shape
    kh, kw, _, o = w.shape
    assert (kh, kw) == (3, 3) and h % 2 == 0 and w_ % 2 == 0
    # s2d: (B, H/2, W/2, ry, rx, C) -> channels ordered (ry, rx, c)
    xs = x.reshape(b, h // 2, 2, w_ // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(b, h // 2, w_ // 2, 4 * c)
    # kernel: pad 3x3 -> 4x4 at the front, split each axis into (dI, r)
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
    w2 = wp.reshape(2, 2, 2, 2, c, o).transpose(0, 2, 1, 3, 4, 5)
    w2 = w2.reshape(2, 2, 4 * c, o)
    # top-left zero pad of 1 in s2d space == the original 'same' padding
    return lax.conv_general_dilated(xs, w2, (1, 1), ((1, 0), (1, 0)),
                                    dimension_numbers=DIMS)


def timed(name, fn, chain, iters=30, warmup=3):
    s = chain
    for _ in range(warmup):
        s = fn(s)
    float(jnp.ravel(jax.tree_util.tree_leaves(s)[0])[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(s)
    float(jnp.ravel(jax.tree_util.tree_leaves(s)[0])[0])
    ms = 1000 * (time.perf_counter() - t0) / iters
    print(json.dumps({"case": name, "ms": round(ms, 3)}), flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    # JSPSR encoder stride-2 shapes (per branch): stage2/3/4 entry convs
    shapes = [
        (16, 128, 128, 192, 128),  # stage2 dem-branch: cin=64*3, 128^2 -> 64^2
        (16, 64, 64, 128, 256),    # stage3
        (16, 32, 32, 512, 512),    # stage4 (concat channels)
    ]
    for b, h, w_, cin, cout in shapes:
        x = jnp.asarray(rng.normal(size=(b, h, w_, cin)).astype(np.float32))
        w = jnp.asarray((rng.normal(size=(3, 3, cin, cout)) * 0.05)
                        .astype(np.float32))
        tag = f"{h}x{w_}x{cin}->{cout}"

        # numerical equality
        d = float(jnp.max(jnp.abs(
            jax.jit(lambda: conv_s2(x, w) - conv_s2_std(x, w))())))
        rel = d / float(jnp.max(jnp.abs(jax.jit(lambda: conv_s2(x, w))())))
        print(json.dumps({"case": f"diff_{tag}", "rel": rel}), flush=True)

        for name, f in (("s2", conv_s2), ("std", conv_s2_std)):
            jf = jax.jit(lambda xx, f=f: f(xx, w))
            # chain via a cheap projection back to the input shape
            proj = jnp.asarray((rng.normal(size=(cout, cin)) * 0.01)
                               .astype(np.float32))

            def fwd_chain(xx, jf=jf):
                y = jf(xx)  # (B, h/2, w/2, cout)
                y2 = jnp.einsum("bhwo,oc->bhwc", y, proj)
                up = jnp.repeat(jnp.repeat(y2, 2, axis=1), 2, axis=2)
                return jnp.tanh(up)

            timed(f"fwd_{name}_{tag}", jax.jit(fwd_chain), x, 20)

            def bwd_chain(xx, f=f):
                g = jax.grad(lambda q: jnp.sum(jnp.tanh(f(q, w))))(xx)
                return xx - 0.001 * g

            timed(f"fwdbwd_{name}_{tag}", jax.jit(bwd_chain), x, 20)

            def wgrad_chain(ww, f=f):
                g = jax.grad(lambda q: jnp.sum(jnp.tanh(f(x, q))))(ww)
                return ww - 0.001 * g

            if name == "s2":
                timed(f"wgrad_{name}_{tag}", jax.jit(wgrad_chain), w, 20)
            else:
                timed(f"wgrad_{name}_{tag}", jax.jit(wgrad_chain), w, 20)


if __name__ == "__main__":
    main()
