"""TPU probe: train-step throughput across batch/remat configs (VERDICT #2).

Runs ALL variants in ONE process (TPU compiles through the axon tunnel are
never cached across processes). Chained-state timing: each step consumes the
previous step's TrainState, so the device must execute sequentially; the
final sync is a scalar fetch of the last loss.

Usage: python scripts/bench_train_probe.py [--iters N]
Writes results to stdout; transfer the winners into PERF.md / bench.py.
"""

import argparse
import json
import re
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


def build(batch, remat_stages=False, remat=False, seed=0, accum_steps=1,
          **model_kw):
    from jspsr_tpu.config.loader import AttrDict
    from jspsr_tpu.losses import build_criterion
    from jspsr_tpu.models.jspsr import JSPSR
    from jspsr_tpu.train.optim import build_optimizer
    from jspsr_tpu.train.state import TrainState
    from jspsr_tpu.train.step import make_train_step

    model = JSPSR({"lr_dem": 1, "image": 3, "mask": 15}, num_feature=32,
                  layers=(2, 2, 2, 2), spn=True, remat_stages=remat_stages,
                  **model_kw)
    params, bn_state = model.init(jax.random.PRNGKey(seed))
    criterion = build_criterion({"L1": 1, "L2": 1, "Grad": 0.1})
    p = AttrDict({"optimizer": "AdamW",
                  "optimizer_kwargs": {"lr": 1e-3, "weight_decay": 1e-6,
                                       "diff_lr": False},
                  "model_name": "JSPSR"})
    optimizer = build_optimizer(p, params)
    state = TrainState(params, bn_state, optimizer.init(params),
                       jnp.zeros((), jnp.int32))
    step = make_train_step(model, criterion, optimizer, remat=remat,
                           accum_steps=accum_steps)

    rng = np.random.default_rng(0)
    dem = jnp.asarray(rng.uniform(0.3, 0.7, (batch, 128, 128, 1)).astype(np.float32))
    img = jnp.asarray(rng.uniform(0, 1, (batch, 128, 128, 3)).astype(np.float32))
    msk = jnp.asarray((rng.uniform(0, 1, (batch, 128, 128, 15)) < 0.1)
                      .astype(np.float32) * 0.5)
    gt = jnp.asarray(rng.uniform(0.3, 0.7, (batch, 128, 128, 1)).astype(np.float32))
    return step, state, [dem, img, msk], gt


def measure(batch, remat_stages=False, remat=False, iters=10, warmup=2,
            accum_steps=1, **model_kw):
    step, state, inputs, gt = build(batch, remat_stages, remat,
                                    accum_steps=accum_steps, **model_kw)
    t_c0 = time.perf_counter()
    first_loss = None
    for _ in range(warmup):
        state, losses = step(state, inputs, gt)
        if first_loss is None:
            first_loss = float(losses["Total"])  # numerics cross-check
    float(losses["Total"])  # sync: compile done + warmup executed
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    for _ in range(iters):
        state, losses = step(state, inputs, gt)
    float(losses["Total"])  # true device sync (chained through state)
    dt = time.perf_counter() - t0
    return {"batch": batch, "remat_stages": remat_stages, "remat": remat,
            "accum_steps": accum_steps, **model_kw,
            "step_ms": round(1000 * dt / iters, 2),
            "tiles_per_sec": round(batch * iters / dt, 1),
            "compile_s": round(compile_s, 1),
            "first_loss": first_loss}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--configs", default="16:plain,24:plain,32:stages,"
                    "48:stages,32:plain")
    args = ap.parse_args()

    print(f"# backend: {jax.default_backend()}, devices: {jax.devices()}",
          file=sys.stderr)
    results = []
    for spec in args.configs.split(","):
        b, mode = spec.split(":", 1)
        kw = {"remat_stages": "stages" in mode, "remat": "full" in mode}
        m = re.search(r"accum(\d+)", mode)  # e.g. 70:accum5 / 70:accum5+bf16
        if m:
            kw["accum_steps"] = int(m.group(1))
        if "bf16" in mode:
            kw["compute_dtype"] = "bfloat16"
        try:
            r = measure(int(b), iters=args.iters, **kw)
        except Exception as e:
            r = {"batch": int(b), **kw, "error": str(e)[:300]}
        results.append(r)
        print(json.dumps(r), flush=True)
    ok = [r for r in results if "error" not in r]
    if ok:
        best = max(ok, key=lambda r: r["tiles_per_sec"])
        print(f"# best: {json.dumps(best)}", file=sys.stderr)


if __name__ == "__main__":
    main()
