"""TPU probe: backward time attribution by model depth (train=True, b16).

bench_step_anatomy.py: grad_train = 96 ms at b16, of which the SPN head is
16 ms and train-mode BN 14 ms — but the remaining ~66 ms is still 3x the
conv-op prediction. This probe truncates the flagship forward after each
stage and takes grads of sum(features), so consecutive deltas attribute
backward milliseconds to stages directly (same XLA layouts as the real
model, unlike the isolated-op probe).

Chained protocol: params <- params - 1e-9 * grads each iteration.
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

BATCH = int(os.environ.get("BATCH", "16"))
ITERS = int(os.environ.get("ITERS", "10"))


def main():
    from jspsr_tpu.models.jspsr import JSPSR

    model = JSPSR({"lr_dem": 1, "image": 3, "mask": 15}, num_feature=32,
                  layers=(2, 2, 2, 2), spn=True)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    dem = jnp.asarray(rng.uniform(0.3, 0.7, (BATCH, 128, 128, 1)).astype(np.float32))
    img = jnp.asarray(rng.uniform(0, 1, (BATCH, 128, 128, 3)).astype(np.float32))
    msk = jnp.asarray((rng.uniform(0, 1, (BATCH, 128, 128, 15)) < 0.1)
                      .astype(np.float32) * 0.5)

    def partial_fwd(p, upto, train=True):
        """Replicates JSPSR.__call__ (models/jspsr.py) up to a given depth."""
        def run(name, *args):
            mod = getattr(model, name)
            out, _ = mod(p.get(name, {}), bn_state.get(name, {}), *args,
                         train=train)
            return out

        feats = {"dem": run("conv_dem", dem), "img": run("conv_img", img),
                 "aux": run("conv_aux", msk)}
        if upto == "stems":
            return sum(jnp.sum(v) for v in feats.values())
        fused = {}
        dem_in = feats["dem"]
        for s in range(1, 5):
            branch_out = {"dem": run(f"layer{s}_dem", dem_in),
                          "img": run(f"layer{s}_img", feats["img"]),
                          "aux": run(f"layer{s}_aux", feats["aux"])}
            ordered = [branch_out["dem"], branch_out["img"], branch_out["aux"]]
            fused[s] = run(f"guide{s}", ordered)
            feats = branch_out
            dem_in = fused[s]
            if upto == f"stage{s}":
                return jnp.sum(fused[s])
        dc3 = run("layer3d", fused[4])
        c3 = jnp.concatenate([dc3, fused[3]], axis=-1)
        dc2 = run("layer2d", c3)
        c2 = jnp.concatenate([dc2, fused[2]], axis=-1)
        dc1 = run("layer1d", c2)
        c1 = jnp.concatenate([dc1, fused[1]], axis=-1)
        c0 = run("conv0", c1)
        if upto == "decoder":
            return jnp.sum(c0)
        dem_sg = jax.lax.stop_gradient(dem)
        (weight, offset), _ = model.generator(
            p["generator"], bn_state.get("generator", {}), dem_sg, c0,
            train=train)
        output, _ = model.postprocessor(p["postprocessor"], {}, dem_sg,
                                        weight, offset, train=train)
        return jnp.sum(output)

    def timed(name, fn, chain, iters=ITERS, warmup=2):
        s = chain
        t_c0 = time.perf_counter()
        for _ in range(warmup):
            s = fn(s)
        float(jnp.ravel(jax.tree_util.tree_leaves(s)[0])[0])
        compile_s = time.perf_counter() - t_c0
        t0 = time.perf_counter()
        for _ in range(iters):
            s = fn(s)
        float(jnp.ravel(jax.tree_util.tree_leaves(s)[0])[0])
        ms = 1000 * (time.perf_counter() - t0) / iters
        print(json.dumps({"case": name, "ms": round(ms, 2),
                          "compile_s": round(compile_s, 1)}), flush=True)
        return ms

    prev = 0.0
    for upto in ["stems", "stage1", "stage2", "stage3", "stage4",
                 "decoder", "full"]:
        def gstep(p_, upto=upto):
            g = jax.grad(lambda q: partial_fwd(q, upto))(p_)
            return jax.tree_util.tree_map(
                lambda a, b: a - 1e-9 * b, p_,
                jax.tree_util.tree_map(lambda x: x if x is not None else 0.0, g))

        ms = timed(f"grad_{upto}", jax.jit(gstep), params)
        print(json.dumps({"delta": upto, "ms": round(ms - prev, 2)}),
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
