"""TPU probe: LRRU BasicDepthEncoder 1x1 head-merge A/B (VERDICT r4 #8).

LRRU is the slowest family (727 t/s fwd, PERF.md) — 4 sequential decoder
rounds each ending in a full-res affinity/offset encoder + deformable
post-process. The rounds are inherently sequential, but each round's
encoder read the full-res bc*4 feature map TWICE (separate conv_weight /
conv_offset 1x1 heads). models/lrru.py now merges the two heads into one
conv at trace time (the JSPSR generator's measured pattern,
models/spn.py:56-71) — x4 rounds per forward.

Arms (interleaved, one session): merged (HEAD) vs unmerged (the previous
implementation, reconstructed by monkeypatch) — fwd and train step, fp32
b16, reference default bc=16.

Usage: python scripts/bench_lrru_merge.py
"""

import json
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp


def _unmerged_call(self, params, state, depth, context, train=False):
    """The pre-merge BasicDepthEncoder body (separate 1x1 heads)."""
    from jspsr_tpu.ops.deform_conv import insert_zero_center_offset

    ns = {}
    d, _ = self.convd1(params["convd1"], {}, depth, train=train)
    d, _ = self.convd2(params["convd2"], {}, d, train=train)
    f, _ = self.convf1(params["convf1"], {}, context, train=train)
    f, _ = self.convf2(params["convf2"], {}, f, train=train)
    feat = jnp.concatenate([d, f], axis=-1)
    feat, _ = self.conv(params["conv"], {}, feat, train=train)
    feat, s = self.ref(params["ref"], state["ref"], feat, train=train)
    if s:
        ns["ref"] = s
    weight, _ = self.conv_weight(params["conv_weight"], {}, feat)
    weight = jax.nn.sigmoid(weight)
    offset, _ = self.conv_offset(params["conv_offset"], {}, feat)
    offset = insert_zero_center_offset(offset, self.kernel_size)
    return (weight, offset), ns


def main():
    from contextlib import contextmanager

    from scripts.bench_models import (BATCH, CASES, chained_fwd_ms,
                                      model_inputs, train_step_ms)
    from jspsr_tpu.config.loader import AttrDict
    from jspsr_tpu.models import lrru as lrru_mod
    from jspsr_tpu.models.factory import build_model

    merged_call = lrru_mod.BasicDepthEncoder.__call__

    @contextmanager
    def unmerged():
        lrru_mod.BasicDepthEncoder.__call__ = _unmerged_call
        try:
            yield
        finally:
            lrru_mod.BasicDepthEncoder.__call__ = merged_call

    mk, input_data = CASES["lrru"]
    p = AttrDict({"model_name": "lrru", "model_kwargs": mk,
                  "input_data": input_data})
    model = build_model(p)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    inputs, rebuild = model_inputs("lrru", input_data, BATCH, rng)
    dem0 = jnp.asarray(rng.uniform(0.3, 0.7, (BATCH, 128, 128, 1)),
                       jnp.float32)
    gt = jnp.asarray(rng.uniform(0.3, 0.7, (BATCH, 128, 128, 1)),
                     jnp.float32)

    # equality first: the merge must be exact math
    (y_m, _) = model(params, bn_state, inputs, train=False)
    with unmerged():
        (y_u, _) = model(params, bn_state, inputs, train=False)
    np.testing.assert_allclose(np.asarray(y_m), np.asarray(y_u),
                               rtol=1e-5, atol=1e-5)
    print("# merged == unmerged (fwd outputs)", flush=True)

    results = {}
    for rnd in range(2):
        for arm in ("merged", "unmerged"):
            ctx = unmerged() if arm == "unmerged" else None
            if ctx:
                ctx.__enter__()
            try:
                fwd = chained_fwd_ms(model, params, bn_state, dem0, rebuild,
                                     trials=2)
                # the train step donates its state: hand it COPIES so the
                # shared params survive for the next arm
                trn = train_step_ms(
                    "lrru", model,
                    jax.tree_util.tree_map(jnp.array, params),
                    jax.tree_util.tree_map(jnp.array, bn_state),
                    inputs, gt, trials=2)
            finally:
                if ctx:
                    ctx.__exit__(None, None, None)
            results.setdefault(f"fwd_{arm}_ms", []).extend(
                round(t, 2) for t in fwd)
            results.setdefault(f"train_{arm}_ms", []).extend(
                round(t, 2) for t in trn)
            print(f"# round {rnd} {arm}: fwd {min(fwd):.2f} ms "
                  f"({BATCH / min(fwd) * 1000:.1f} t/s), "
                  f"train {min(trn):.2f} ms", flush=True)

    summary = {k: {"trials": v, "best_ms": min(v),
                   "tiles_per_sec": round(BATCH / min(v) * 1000, 1)}
               for k, v in results.items()}
    for kind in ("fwd", "train"):
        m, u = (summary[f"{kind}_merged_ms"]["best_ms"],
                summary[f"{kind}_unmerged_ms"]["best_ms"])
        summary[f"{kind}_merged_vs_unmerged_pct"] = round((u / m - 1) * 100, 1)
    print(json.dumps(summary))
    Path("/tmp/bench_lrru_merge.json").write_text(json.dumps(summary))


if __name__ == "__main__":
    main()
