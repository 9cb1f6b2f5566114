"""TPU probe: spn_sample_dtype='bfloat16' A/B (VERDICT r4 #6).

The bf16-body train step (299 t/s, BENCH_r04) sits below the ~550
implied by forward efficiency x the 3.01 FLOP ratio; the PERF.md anatomy
puts part of the residual in the intentionally-fp32 deformable sampling
(~4.9 ms of the 61.4 ms b16 step). The Pallas kernel's bottleneck is the
per-tap image matmul, which runs fp32 at 1/4 the bf16 MXU rate — this
probe measures the step/forward effect of running those matmuls in bf16
(fp32 accumulation; ops/pallas_deform.py sample_dtype).

Arms (interleaved in ONE session so tunnel drift cancels):
  fwd_bf16_b16        eval forward, bf16 body, fp32 sampling (baseline)
  fwd_bf16_sdt_b16    same + spn_sample_dtype=bfloat16
  train_bf16_b48      train step, bf16 body, fp32 sampling (baseline)
  train_bf16_sdt_b48  same + spn_sample_dtype=bfloat16

Usage: python scripts/bench_sample_dtype.py
"""

import json
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))


def main():
    import bench

    results = {}
    arms = [
        ("fwd_bf16_b16",
         lambda: bench.measure(16, trials=2, compute_dtype="bfloat16")),
        ("fwd_bf16_sdt_b16",
         lambda: bench.measure(16, trials=2, compute_dtype="bfloat16",
                               spn_sample_dtype="bfloat16")),
        ("train_bf16_b48",
         lambda: bench.measure_train(48, False, trials=2,
                                     compute_dtype="bfloat16")),
        ("train_bf16_sdt_b48",
         lambda: bench.measure_train(48, False, trials=2,
                                     compute_dtype="bfloat16",
                                     spn_sample_dtype="bfloat16")),
    ]
    # two interleaved rounds: A B A B per arm pair
    for rnd in range(2):
        for name, fn in arms:
            trials = fn()
            results.setdefault(name, []).extend(round(t, 1) for t in trials)
            print(f"# round {rnd} {name}: best {max(results[name]):.1f} t/s "
                  f"{results[name]}", flush=True)

    summary = {k: {"trials": v, "best": max(v)} for k, v in results.items()}
    for base, fast in (("fwd_bf16_b16", "fwd_bf16_sdt_b16"),
                       ("train_bf16_b48", "train_bf16_sdt_b48")):
        summary[f"{fast}_vs_{base}_pct"] = round(
            (summary[fast]["best"] / summary[base]["best"] - 1) * 100, 1)
    print(json.dumps(summary))
    Path("/tmp/bench_sample_dtype.json").write_text(json.dumps(summary))


if __name__ == "__main__":
    main()
