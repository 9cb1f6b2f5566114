"""TPU probe: throughput of every model family (SURVEY §2.1) on one v5e.

The reference ships four models (JSPSR, EDSR, LRRU, CompletionFormer) but
publishes numbers only for JSPSR. This probe gives each family an eval
forward (chained lax.scan, dispatch amortized — bench.py protocol) and a
full train-step (fwd+bwd+AdamW) measurement at its reference-default
config, fp32, 128² tiles, one process. Results -> PERF.md model table.
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

BATCH = 16

# model_name -> (model_kwargs, input_data). Reference-default configs:
# JSPSR 3-branch nb2/nf32+SPN (configs/jspsr_r8_img_msk.yml), EDSR
# 16x64 (models/EDSR.py defaults), LRRU bc=16, CompletionFormer
# PVT+NLSPN 6-iter TGASS (models/CompletionFormer.py defaults).
CASES = {
    "jspsr": ({"num_block": 2, "num_feature": 32, "spn": True},
              {"lr_dem": 1, "image": 3, "mask": 15}),
    "edsr": ({"num_block": 16, "num_feature": 64, "spn": False},
             {"lr_dem": 1, "image": 3}),
    "lrru": ({"bc": 16, "prob": 1.0},
             {"lr_dem": 1, "image": 3}),
    "completionformer": ({"prop_time": 6, "conf_prop": True},
                         {"lr_dem": 1, "image": 3}),
}

# chained-forward scan length per family. 10 amortizes the ~2 ms tunnel
# dispatch to noise; CompletionFormer's PVT+NLSPN graph x10 exceeds the
# remote compiler (broken pipe at scan length 10), so it chains 2 — at
# its ~40 ms forward the residual dispatch tax is ~2-3 %, noted in PERF.
INNER = {"completionformer": 2}


def model_inputs(name, input_data, batch, rng):
    """Returns (inputs, rebuild) — rebuild(pred_1ch) re-assembles the
    model's input list with the prediction in the DEM slot, so the chained
    timing loop stays shape-consistent for every input convention."""
    arrs = {
        "lr_dem": rng.uniform(0.3, 0.7, (batch, 128, 128, 1)),
        "image": rng.uniform(0, 1, (batch, 128, 128, 3)),
        "mask": (rng.uniform(0, 1, (batch, 128, 128, 15)) < 0.1) * 0.5,
    }
    parts = [jnp.asarray(arrs[k], jnp.float32) for k in input_data]
    if name in ("jspsr", "lrru"):
        return parts, lambda d: [d] + parts[1:]
    if name == "completionformer":
        guide = jnp.concatenate(parts[1:], axis=-1)
        return [parts[0], guide], lambda d: [d, guide]
    guide = jnp.concatenate(parts[1:], axis=-1)  # edsr: one concat input
    return ([jnp.concatenate([parts[0], guide], axis=-1)],
            lambda d: [jnp.concatenate([d, guide], axis=-1)])


def chained_fwd_ms(model, params, bn_state, dem0, rebuild, iters=4, inner=10,
                   trials=3):
    # params/bn_state ride as jit ARGUMENTS: closed-over they embed as
    # program constants and an 83M-param model blows the remote-compile
    # request-size limit (HTTP 413 through the axon tunnel)
    def chain(prm, bst, d):
        def body(dd, _):
            pred, _ = model(prm, bst, rebuild(dd), train=False)
            return jnp.clip(pred, 0.05, 0.95), None
        out, _ = lax.scan(body, d, None, length=inner)
        return out

    cfn = jax.jit(chain)
    jfn = lambda d: cfn(params, bn_state, d)
    d = dem0
    for _ in range(2):
        d = jfn(d)
    float(d[0, 0, 0, 0])
    out = []
    for _ in range(trials):
        t0 = time.perf_counter()
        s = d
        for _ in range(iters):
            s = jfn(s)
        float(s[0, 0, 0, 0])
        out.append(1000 * (time.perf_counter() - t0) / (iters * inner))
    return out


def train_step_ms(name, model, params, bn_state, inputs, gt, iters=10,
                  trials=3):
    from jspsr_tpu.config.loader import AttrDict
    from jspsr_tpu.losses import build_criterion
    from jspsr_tpu.train.optim import build_optimizer
    from jspsr_tpu.train.state import TrainState
    from jspsr_tpu.train.step import make_train_step

    criterion = build_criterion({"L1": 1})
    p = AttrDict({"optimizer": "AdamW",
                  "optimizer_kwargs": {"lr": 1e-3, "weight_decay": 1e-6,
                                       "diff_lr": False},
                  "model_name": name})
    optimizer = build_optimizer(p, params)
    state = TrainState(params, bn_state, optimizer.init(params),
                       jnp.zeros((), jnp.int32))
    step = make_train_step(model, criterion, optimizer)
    for _ in range(2):
        state, losses = step(state, inputs, gt)
    float(losses["Total"])
    out = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, losses = step(state, inputs, gt)
        float(losses["Total"])
        out.append(1000 * (time.perf_counter() - t0) / iters)
    return out


def main():
    from jspsr_tpu.config.loader import AttrDict
    from jspsr_tpu.models.factory import build_model
    from jspsr_tpu.utils.summary import count_parameters

    only = [a for a in sys.argv[1:] if a in CASES]
    rng = np.random.default_rng(0)
    rows = []
    for name, (mk, input_data) in CASES.items():
        if only and name not in only:
            continue
        p = AttrDict({"model_name": name, "model_kwargs": mk,
                      "input_data": input_data})
        model = build_model(p)
        params, bn_state = model.init(jax.random.PRNGKey(0))
        inputs, rebuild = model_inputs(name, input_data, BATCH, rng)
        dem0 = jnp.asarray(rng.uniform(0.3, 0.7, (BATCH, 128, 128, 1)),
                           jnp.float32)
        gt = jnp.asarray(rng.uniform(0.3, 0.7, (BATCH, 128, 128, 1)),
                         jnp.float32)
        row = {"model": name,
               "params_m": round(count_parameters(params) / 1e6, 2)}
        try:
            inner = INNER.get(name, 10)
            ms = min(chained_fwd_ms(model, params, bn_state, dem0, rebuild,
                                    iters=4 if inner == 10 else 10,
                                    inner=inner))
            row["fwd_ms"] = round(ms, 2)
            row["fwd_tiles_per_sec"] = round(BATCH / ms * 1000, 1)
        except Exception as e:
            row["fwd_error"] = str(e)[:200]
        try:
            ms = min(train_step_ms(name, model, params, bn_state, inputs,
                                   gt))
            row["train_ms"] = round(ms, 2)
            row["train_tiles_per_sec"] = round(BATCH / ms * 1000, 1)
        except Exception as e:
            row["train_error"] = str(e)[:200]
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("\n| model | params (M) | fwd ms (b16) | fwd t/s | train ms | train t/s |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['model']} | {r['params_m']} | {r.get('fwd_ms', '-')} | "
              f"{r.get('fwd_tiles_per_sec', '-')} | {r.get('train_ms', '-')} "
              f"| {r.get('train_tiles_per_sec', '-')} |")
    Path("/tmp/bench_models.json").write_text(json.dumps(rows))


if __name__ == "__main__":
    main()
