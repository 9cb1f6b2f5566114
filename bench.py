"""Throughput benchmark: DEM tiles/sec/chip on the flagship JSPSR.

Protocol (BASELINE.json): 128x128 DEM tiles at x8 SR with image+mask
guidance, single chip. Prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "tiles/sec/chip", "vs_baseline": R,
   "train_step_tiles_per_sec": T, ...}

- value: eval-mode forward throughput (the headline).
- vs_baseline = value / (10 * torch-reference-CPU tiles/sec): the honest
  denominator is the ACTUAL PyTorch reference forward on host CPU
  (scripts/measure_cpu_baseline.py; cached in BASELINE_CPU.json).
  >= 1.0 means the >=10x-CPU north star is met.
- train_step_tiles_per_sec: full fwd+bwd+AdamW update throughput at the
  best measured config (scripts/bench_train_probe.py sweep).
- train_step_bf16_tiles_per_sec: same step with the accuracy-gated
  mixed-precision bf16 body (PERF.md; RMSE parity in the soak gate).
- forward_bf16_tiles_per_sec: eval forward with the bf16 body at b16.
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(ROOT))
# compiles through the TPU tunnel are slow (minutes); cache them persistently
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))


def _cpu_baseline():
    path = ROOT / "BASELINE_CPU.json"
    if not path.exists():
        subprocess.run(
            [sys.executable, str(ROOT / "scripts" / "measure_cpu_baseline.py")],
            check=True,
            timeout=1800,
        )
    blob = json.loads(path.read_text())
    # torch reference CPU when measured; legacy JAX-CPU number as fallback
    return blob.get("torch_cpu_tiles_per_sec") or blob["cpu_tiles_per_sec"]


def measure(batch, iters=20, warmup=3, **model_kw):
    """Chained measurement: each iteration's DEM input depends on the
    previous prediction, and the final sync is a scalar fetch. This defeats
    runtimes whose block_until_ready does not actually wait for device
    completion (observed through the axon tunnel), so the number is a true
    sequential-execution throughput."""
    import jax
    import jax.numpy as jnp
    import __graft_entry__ as g

    model, params, bn_state = g._flagship(**model_kw)
    dem, img, msk = g._example_inputs(batch, 128, 128)

    def fn(d, i, m):
        pred, _ = model(params, bn_state, [d, i, m], train=False)
        return pred

    jfn = jax.jit(fn)
    d = dem
    for _ in range(warmup):
        d = jnp.clip(jfn(d, img, msk), 0.05, 0.95)
    float(d[0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        d = jnp.clip(jfn(d, img, msk), 0.05, 0.95)
    float(d[0, 0, 0, 0])  # true device sync
    dt = time.perf_counter() - t0
    return batch * iters / dt


def measure_train(batch, remat_stages, iters=10, warmup=2, **model_kw):
    """Full train step (fwd+bwd+AdamW+BN merge), chained through TrainState."""
    from scripts.bench_train_probe import build

    step, state, inputs, gt = build(batch, remat_stages=remat_stages,
                                    **model_kw)
    for _ in range(warmup):
        state, losses = step(state, inputs, gt)
    float(losses["Total"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, losses = step(state, inputs, gt)
    float(losses["Total"])  # chained sync
    return batch * iters / (time.perf_counter() - t0)


def main():
    # batch 16 overtook 64 as the forward sweet spot once dispatch was
    # chain-hidden (PERF.md); probe both by default, more with --sweep.
    # TPU compiles through the tunnel are uncached across processes.
    batches = (16, 32, 64) if "--sweep" in sys.argv else (16, 64)
    best_tps, best_batch = 0.0, 0
    for batch in batches:
        try:
            tps = measure(batch)
        except Exception as e:  # OOM guard at large batch
            print(f"# batch {batch} failed: {e}", file=sys.stderr)
            continue
        print(f"# batch {batch}: {tps:.1f} tiles/s", file=sys.stderr)
        if tps > best_tps:
            best_tps, best_batch = tps, batch
    if best_batch == 0 and 16 not in batches:
        # fallback to a small batch if 64 failed (tighter-memory chip)
        try:
            best_tps, best_batch = measure(16), 16
            print(f"# batch 16 (fallback): {best_tps:.1f} tiles/s",
                  file=sys.stderr)
        except Exception as e:
            print(f"# fallback failed: {e}", file=sys.stderr)

    # train-step throughput at the best probed config (PERF.md sweep:
    # b16 plain wins; b32 fits without remat since the fused Pallas VJP
    # but is slightly slower)
    train_tps, train_cfg = None, None
    for batch, stages in ((16, False), (32, False)):
        try:
            train_tps = measure_train(batch, stages)
            train_cfg = {"batch": batch, "remat_stages": stages}
            print(f"# train b{batch} stages={stages}: {train_tps:.1f} t/s",
                  file=sys.stderr)
            break
        except Exception as e:
            print(f"# train b{batch} failed: {e}", file=sys.stderr)

    # bf16-body forward (accuracy-gated; PERF.md mixed-precision section)
    fwd_bf16_tps = None
    try:
        fwd_bf16_tps = measure(16, compute_dtype="bfloat16")
        print(f"# fwd b16 bf16: {fwd_bf16_tps:.1f} t/s", file=sys.stderr)
    except Exception as e:
        print(f"# fwd bf16 failed: {e}", file=sys.stderr)

    # mixed-precision bf16 body: the accuracy-gated fast training path
    # (PERF.md "Mixed-precision bf16 body"; soak gate passed at RMSE parity;
    # b48 is the measured bf16 sweet spot, scripts/bench_bf16_sweep.py)
    train_bf16_tps = None
    for batch in (48, 16):
        try:
            train_bf16_tps = measure_train(batch, False,
                                           compute_dtype="bfloat16")
            print(f"# train b{batch} bf16: {train_bf16_tps:.1f} t/s",
                  file=sys.stderr)
            break
        except Exception as e:
            print(f"# train bf16 b{batch} failed: {e}", file=sys.stderr)

    try:
        cpu_tps = _cpu_baseline()
        vs = best_tps / (10.0 * cpu_tps)
    except Exception as e:
        print(f"# cpu baseline unavailable: {e}", file=sys.stderr)
        vs = None
    print(json.dumps({
        "metric": "jspsr_x8_forward_throughput",
        "value": round(best_tps, 2),
        "unit": "tiles/sec/chip",
        "vs_baseline": round(vs, 3) if vs is not None else None,
        "batch": best_batch,
        "train_step_tiles_per_sec": (round(train_tps, 1)
                                     if train_tps else None),
        "train_config": train_cfg,
        "train_step_bf16_tiles_per_sec": (round(train_bf16_tps, 1)
                                          if train_bf16_tps else None),
        "forward_bf16_tiles_per_sec": (round(fwd_bf16_tps, 1)
                                       if fwd_bf16_tps else None),
    }))


if __name__ == "__main__":
    main()
