"""TPU probe: eval-path numbers — bs=1 latency vs batched throughput (the
VERDICT #9 'measured >=2x' evidence) and Pallas block-size tuning.

One process, chained timing (see PERF.md protocol).
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


def timed(name, fn, chain, iters, warmup=3):
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
    import __graft_entry__ as g

    model, params, bn_state = g._flagship()

    for batch, iters in ((1, 60), (16, 30)):
        dem, img, msk = g._example_inputs(batch, 128, 128)

        def fwd(d):
            pred, _ = model(params, bn_state, [d, img, msk], train=False)
            return jnp.clip(pred, 0.05, 0.95)

        ms = timed(f"model_fwd_b{batch}", jax.jit(fwd), dem, iters)
        print(json.dumps({"case": f"tiles_per_sec_b{batch}",
                          "value": round(batch / ms * 1000, 1)}), flush=True)

    # Pallas forward block-size tuning at b16
    from jspsr_tpu.ops.pallas_deform import _pallas_forward

    rng = np.random.default_rng(0)
    b = 16
    x = jnp.asarray(rng.uniform(0.2, 0.8, (b, 128, 128, 1)).astype(np.float32))
    off = jnp.asarray((rng.normal(size=(b, 128, 128, 18)) * 1.5)
                      .astype(np.float32))
    mask = jnp.asarray(rng.uniform(0, 1, (b, 128, 128, 9)).astype(np.float32))
    wgt = jnp.asarray(rng.normal(size=(3, 3, 1, 1)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(1,)).astype(np.float32))
    for bh in (4, 8, 16, 32):
        f = jax.jit(lambda xx, bh=bh: _pallas_forward(
            xx, off, wgt, bias, mask, padding=1, block_rows=bh))
        timed(f"pallas_fwd_bh{bh}", lambda s, f=f: jnp.clip(f(s), 0, 1),
              x, 30)

    # ---- train-step decomposition at b16: where do the 98 ms go? ----
    from scripts.bench_train_probe import build

    step, state, inputs, gt = build(16)
    model2 = None  # reuse the step's closures via fresh jits below
    from jspsr_tpu.config.loader import AttrDict
    from jspsr_tpu.losses import build_criterion
    from jspsr_tpu.models.jspsr import JSPSR

    model2 = JSPSR({"lr_dem": 1, "image": 3, "mask": 15}, num_feature=32,
                   layers=(2, 2, 2, 2), spn=True)
    params2, bn2 = model2.init(jax.random.PRNGKey(0))
    criterion = build_criterion({"L1": 1, "L2": 1, "Grad": 0.1})

    def train_fwd(d):
        pred, _ = model2(params2, bn2, [d, inputs[1], inputs[2]], train=True)
        return jnp.clip(pred, 0.05, 0.95)

    timed("train_mode_fwd_b16", jax.jit(train_fwd), inputs[0], 20)

    def vag(p):
        def loss_fn(pp):
            pred, _ = model2(pp, bn2, inputs, train=True)
            return criterion(pred, gt)["Total"]
        g = jax.grad(loss_fn)(p)
        # chain: tiny decayed update so shapes/values keep flowing
        return jax.tree_util.tree_map(lambda a, b: a - 1e-6 * b, p, g)

    timed("fwd_bwd_only_b16", jax.jit(vag), params2, 10)

    def full(s):
        s2, _ = step(s, inputs, gt)
        return s2

    timed("full_step_b16", full, state, 10)


if __name__ == "__main__":
    main()
