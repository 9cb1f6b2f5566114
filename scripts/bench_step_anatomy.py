"""TPU probe: anatomy of the flagship train step (where do 98.6 ms go?).

bench_bwd_breakdown.py showed the raw convs account for only ~35 ms fwd +
~23 ms bwd of the measured 98.6 ms step — the gap must be in train-mode
BatchNorm, elementwise glue (ReLU/CBAM/residuals), the SPN head backward,
the loss, or the optimizer. This probe times the REAL model under ablated
step variants to attribute it:

  eval_fwd     : model(train=False)                      [known ~13.6 ms]
  train_fwd    : model(train=True) forward only           (+BN batch stats)
  grad_frozen  : value_and_grad with train=False          (BN-train cost out)
  grad_train   : value_and_grad with train=True           (the real backward)
  grad_l1      : grad_train with L1-only loss             (Grad-sobel loss out)
  grad_nospn   : grad_train on spn=False model            (SPN head out)
  full_step    : make_train_step (grad + AdamW + BN merge) [known ~98.6 ms]

Chained-state protocol (PERF.md): every iteration consumes the previous
iteration's output; one scalar fetch at the end is the only sync.
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


def setup(spn=True):
    from jspsr_tpu.config.loader import AttrDict
    from jspsr_tpu.losses import build_criterion
    from jspsr_tpu.models.jspsr import JSPSR
    from jspsr_tpu.train.optim import build_optimizer
    from jspsr_tpu.train.state import TrainState
    from jspsr_tpu.train.step import make_train_step

    model = JSPSR({"lr_dem": 1, "image": 3, "mask": 15}, num_feature=32,
                  layers=(2, 2, 2, 2), spn=spn)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    criterion = build_criterion({"L1": 1, "L2": 1, "Grad": 0.1})
    crit_l1 = build_criterion({"L1": 1})
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
    return (model, params, bn_state, criterion, crit_l1, optimizer, state,
            step, [dem, img, msk], gt)


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


def main():
    (model, params, bn_state, criterion, crit_l1, optimizer, state, step,
     inputs, gt) = setup(spn=True)
    dem, img, msk = inputs

    # 1. eval forward (chained dem <- pred)
    @jax.jit
    def eval_fwd(d):
        pred, _ = model(params, bn_state, [d, img, msk], train=False)
        return jnp.clip(pred, 0.29, 0.71)

    timed("eval_fwd", eval_fwd, dem)

    # 2. train-mode forward (BN batch stats computed, state returned)
    @jax.jit
    def train_fwd(d):
        pred, bn_up = model(params, bn_state, [d, img, msk], train=True)
        return jnp.clip(pred, 0.29, 0.71)

    timed("train_fwd", train_fwd, dem)

    def chain_params(p_, grads):
        return jax.tree_util.tree_map(lambda a, g: a - 1e-9 * g, p_, grads)

    # 3. grads with BN frozen (train=False in the loss closure)
    @jax.jit
    def grad_frozen(p_):
        def loss_fn(q):
            pred, _ = model(q, bn_state, inputs, train=False)
            return criterion(pred, gt)["Total"]
        return chain_params(p_, jax.grad(loss_fn)(p_))

    timed("grad_frozen_bn", grad_frozen, params)

    # 4. grads with train-mode BN (the real backward)
    @jax.jit
    def grad_train(p_):
        def loss_fn(q):
            pred, _ = model(q, bn_state, inputs, train=True)
            return criterion(pred, gt)["Total"]
        return chain_params(p_, jax.grad(loss_fn)(p_))

    timed("grad_train", grad_train, params)

    # 5. L1-only loss (isolate the Grad sobel term's backward)
    @jax.jit
    def grad_l1(p_):
        def loss_fn(q):
            pred, _ = model(q, bn_state, inputs, train=True)
            return crit_l1(pred, gt)["Total"]
        return chain_params(p_, jax.grad(loss_fn)(p_))

    timed("grad_l1_only", grad_l1, params)

    # 6. full step (grad + AdamW + BN merge, donated)
    def full(s):
        s2, _ = step(s, inputs, gt)
        return s2

    timed("full_step", full, state)

    # 7. no-SPN model (plain conv head) for the SPN share
    model2, params2, bn2 = setup(spn=False)[:3]

    @jax.jit
    def grad_nospn(p_):
        def loss_fn(q):
            pred, _ = model2(q, bn2, inputs, train=True)
            return criterion(pred, gt)["Total"]
        return chain_params(p_, jax.grad(loss_fn)(p_))

    timed("grad_nospn", grad_nospn, params2)


if __name__ == "__main__":
    main()
