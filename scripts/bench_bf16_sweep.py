"""TPU probe: bf16-body batch sweep + step anatomy (what bounds 61 ms?).

The mixed-precision body halves activation memory and bandwidth; this
probe answers (a) does a larger batch now beat b16 on the train step,
(b) where the bf16 step spends its time (train-mode BN vs SPN vs rest),
(c) the b64 bf16 eval forward for the bench headline context.

Chained protocol (PERF.md). One process, all variants.
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

ITERS = int(os.environ.get("ITERS", "10"))


def timed(name, fn, chain, batch, iters=ITERS, warmup=2):
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
                      "tiles_per_sec": round(batch / ms * 1000, 1),
                      "compile_s": round(compile_s, 1)}), flush=True)
    return ms


def inputs_for(batch):
    rng = np.random.default_rng(0)
    dem = jnp.asarray(rng.uniform(0.3, 0.7, (batch, 128, 128, 1)).astype(np.float32))
    img = jnp.asarray(rng.uniform(0, 1, (batch, 128, 128, 3)).astype(np.float32))
    msk = jnp.asarray((rng.uniform(0, 1, (batch, 128, 128, 15)) < 0.1)
                      .astype(np.float32) * 0.5)
    gt = jnp.asarray(rng.uniform(0.3, 0.7, (batch, 128, 128, 1)).astype(np.float32))
    return [dem, img, msk], gt


def main():
    from scripts.bench_train_probe import build

    # (a) train batch sweep with the bf16 body
    for batch in (16, 32, 48, 64):
        try:
            step, state, inputs, gt = build(batch,
                                            compute_dtype="bfloat16")

            def full(s):
                s2, _ = step(s, inputs, gt)
                return s2

            timed(f"train_bf16_b{batch}", full, state, batch)
        except Exception as e:
            print(f"# train bf16 b{batch} failed: {type(e).__name__}",
                  flush=True)

    # (b) bf16 step anatomy at b16
    from jspsr_tpu.losses import build_criterion
    from jspsr_tpu.models.jspsr import JSPSR

    model = JSPSR({"lr_dem": 1, "image": 3, "mask": 15}, num_feature=32,
                  layers=(2, 2, 2, 2), spn=True, compute_dtype="bfloat16")
    params, bn_state = model.init(jax.random.PRNGKey(0))
    criterion = build_criterion({"L1": 1, "L2": 1, "Grad": 0.1})
    inputs, gt = inputs_for(16)
    dem, img, msk = inputs

    @jax.jit
    def train_fwd(d):
        pred, _ = model(params, bn_state, [d, img, msk], train=True)
        return jnp.clip(pred, 0.29, 0.71)

    timed("bf16_train_fwd_b16", train_fwd, dem, 16)

    def chain_params(p_, grads):
        return jax.tree_util.tree_map(lambda a, g: a - 1e-9 * g, p_, grads)

    @jax.jit
    def grad_frozen(p_):
        def loss_fn(q):
            pred, _ = model(q, bn_state, inputs, train=False)
            return criterion(pred, gt)["Total"]
        return chain_params(p_, jax.grad(loss_fn)(p_))

    timed("bf16_grad_frozen_bn_b16", grad_frozen, params, 16)

    @jax.jit
    def grad_train(p_):
        def loss_fn(q):
            pred, _ = model(q, bn_state, inputs, train=True)
            return criterion(pred, gt)["Total"]
        return chain_params(p_, jax.grad(loss_fn)(p_))

    timed("bf16_grad_train_b16", grad_train, params, 16)

    model2 = JSPSR({"lr_dem": 1, "image": 3, "mask": 15}, num_feature=32,
                   layers=(2, 2, 2, 2), spn=False,
                   compute_dtype="bfloat16")
    params2, bn2 = model2.init(jax.random.PRNGKey(0))

    @jax.jit
    def grad_nospn(p_):
        def loss_fn(q):
            pred, _ = model2(q, bn2, inputs, train=True)
            return criterion(pred, gt)["Total"]
        return chain_params(p_, jax.grad(loss_fn)(p_))

    timed("bf16_grad_nospn_b16", grad_nospn, params2, 16)

    # (c) eval forward at b64 with the bf16 body
    inputs64, _ = inputs_for(64)
    dem64, img64, msk64 = inputs64

    @jax.jit
    def eval_fwd(d):
        pred, _ = model(params, bn_state, [d, img64, msk64], train=False)
        return jnp.clip(pred, 0.29, 0.71)

    timed("bf16_eval_fwd_b64", eval_fwd, dem64, 64)


if __name__ == "__main__":
    main()
