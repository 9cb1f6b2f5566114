"""TPU probe: XLA compiler-flag sweep on the flagship train step.

XLA_FLAGS are read at backend init, so each variant needs its own process
(this is the one probe where the one-process rule cannot hold). To keep
cross-process drift honest, the baseline (no extra flags) runs FIRST and
LAST and every variant is judged against the span of the two baselines.

Flags probed (documented TPU backend flags only — unknown flag names make
XLA abort at startup):
- --xla_tpu_scoped_vmem_limit_kib: raises the per-fusion VMEM budget;
  bigger fusions can absorb more of the BN/bias/ReLU glue around convs.
- --xla_tpu_enable_latency_hiding_scheduler: instruction scheduler that
  overlaps copies/collectives with compute (mostly a multi-chip feature;
  probed to confirm it is neutral-or-better single-chip).

Usage: python scripts/bench_xla_flags.py [--config 48:bf16] [--iters 10]
"""

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

VARIANTS = [
    ("baseline", ""),
    ("vmem32m", "--xla_tpu_scoped_vmem_limit_kib=32768"),
    ("vmem64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("lhs", "--xla_tpu_enable_latency_hiding_scheduler=true"),
    ("baseline2", ""),
]


def run_one(flags: str, config: str, iters: int):
    env = dict(os.environ)
    base = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = (base + " " + flags).strip()
    # flag variants must not share compiled programs with the baseline
    env["JAX_COMPILATION_CACHE_DIR"] = ""
    out = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "bench_train_probe.py"),
         "--configs", config, "--iters", str(iters)],
        capture_output=True, text=True, timeout=1800, env=env,
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    return {"error": (out.stderr or out.stdout)[-300:]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="48:bf16")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    results = {}
    for name, flags in VARIANTS:
        r = run_one(flags, args.config, args.iters)
        results[name] = r
        print(json.dumps({"variant": name, "flags": flags, **r}), flush=True)

    base_tps = [results[k].get("tiles_per_sec") for k in ("baseline", "baseline2")]
    base_tps = [t for t in base_tps if t]
    if base_tps:
        lo, hi = min(base_tps), max(base_tps)
        summary = {"baseline_span": [lo, hi]}
        for name, _ in VARIANTS[1:-1]:
            t = results[name].get("tiles_per_sec")
            if t:
                summary[name] = {"tiles_per_sec": t,
                                 "vs_baseline_best": round(t / hi, 3),
                                 "clear_win": t > hi * 1.02}
        print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
