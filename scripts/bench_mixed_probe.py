"""TPU probe: fused stems + mixed-precision bf16 body vs round-2 fp32.

Measures eval forward and full train step at b16 for:
  fp32_fused   : fp32 body, fused stems (the new default)
  bf16_fused   : bf16 body (compute_dtype=bfloat16), fused stems
  fp32_unfused : round-2 baseline for the stem-fusion delta

Chained protocol (PERF.md). Numbers go to PERF.md's step-anatomy section.
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


def build(fuse_stems=True, compute_dtype=None):
    from jspsr_tpu.config.loader import AttrDict
    from jspsr_tpu.losses import build_criterion
    from jspsr_tpu.models.jspsr import JSPSR
    from jspsr_tpu.train.optim import build_optimizer
    from jspsr_tpu.train.state import TrainState
    from jspsr_tpu.train.step import make_train_step

    model = JSPSR({"lr_dem": 1, "image": 3, "mask": 15}, num_feature=32,
                  layers=(2, 2, 2, 2), spn=True, fuse_stems=fuse_stems,
                  compute_dtype=compute_dtype)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    criterion = build_criterion({"L1": 1, "L2": 1, "Grad": 0.1})
    p = AttrDict({"optimizer": "AdamW",
                  "optimizer_kwargs": {"lr": 1e-3, "weight_decay": 1e-6,
                                       "diff_lr": False},
                  "model_name": "JSPSR"})
    optimizer = build_optimizer(p, params)
    state = TrainState(params, bn_state, optimizer.init(params),
                       jnp.zeros((), jnp.int32))
    step = make_train_step(model, criterion, optimizer)
    rng = np.random.default_rng(0)
    dem = jnp.asarray(rng.uniform(0.3, 0.7, (BATCH, 128, 128, 1)).astype(np.float32))
    img = jnp.asarray(rng.uniform(0, 1, (BATCH, 128, 128, 3)).astype(np.float32))
    msk = jnp.asarray((rng.uniform(0, 1, (BATCH, 128, 128, 15)) < 0.1)
                      .astype(np.float32) * 0.5)
    gt = jnp.asarray(rng.uniform(0.3, 0.7, (BATCH, 128, 128, 1)).astype(np.float32))
    return model, params, bn_state, step, state, [dem, img, msk], gt


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
                      "tiles_per_sec": round(BATCH / ms * 1000, 1),
                      "compile_s": round(compile_s, 1)}), flush=True)
    return ms


def run_variant(tag, **kw):
    model, params, bn_state, step, state, inputs, gt = build(**kw)
    dem, img, msk = inputs

    @jax.jit
    def eval_fwd(d):
        pred, _ = model(params, bn_state, [d, img, msk], train=False)
        return jnp.clip(pred, 0.29, 0.71)

    timed(f"eval_fwd_{tag}", eval_fwd, dem)

    def full(s):
        s2, _ = step(s, inputs, gt)
        return s2

    timed(f"train_step_{tag}", full, state)


def main():
    variants = {
        "fp32_fused": dict(fuse_stems=True),
        "bf16_fused": dict(fuse_stems=True, compute_dtype="bfloat16"),
        "fp32_unfused": dict(fuse_stems=False),
        "bf16_unfused": dict(fuse_stems=False, compute_dtype="bfloat16"),
    }
    selected = [a for a in sys.argv[1:] if a in variants] or list(variants)
    for tag in selected:
        run_variant(tag, **variants[tag])


if __name__ == "__main__":
    main()
