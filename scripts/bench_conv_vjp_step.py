"""TPU A/B probe: full train step with the manual-dgrad conv VJP off vs on.

Measures the FLAGSHIP train step (bench_train_probe.build) at the two
headline configs (fp32 b16, bf16 b48) with nn.layers._CONV_S1_CUSTOM_VJP
toggled, all in ONE process (same-process relative numbers are the only
trustworthy ones through the axon tunnel; PERF.md "Measurement protocol").
Also asserts the first-step losses match between the two lowerings.

Usage: python scripts/bench_conv_vjp_step.py [--iters N]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))

import jax

from jspsr_tpu.nn import layers as L
from scripts.bench_train_probe import measure


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    print(f"# backend: {jax.default_backend()}", file=sys.stderr)
    cases = [
        ("fp32_b16", dict(batch=16)),
        ("bf16_b48", dict(batch=48, compute_dtype="bfloat16")),
    ]
    # (key, mode, max_ch, wgrad_dot). max_ch=64 restricts the manual dgrad
    # to the narrow convs where XLA's lowering is the measured 1.8x-SOL
    # outlier (stage-1 body, SPN weight path) so wide convs keep full fusion.
    # vjp_on (all convs, 0.973x/0.997x) and vjp_wgdot (0.29-0.45x) are
    # already recorded in PERF.md; the sweep now probes the selective wraps.
    variants = [("vjp_off", False, None, False),
                ("vjp_max64", True, 64, False),
                ("vjp_max128", True, 128, False)]
    for tag, kw in cases:
        out = {"case": tag}
        for key, flip, max_ch, wgdot in variants:
            L.set_conv_s1_custom_vjp(flip, max_ch=max_ch)
            L.set_conv_s1_wgrad_dot(wgdot)
            try:
                r = measure(iters=args.iters, **kw)
            except Exception as e:
                out.setdefault("errors", {})[key] = str(e)[:300]
                continue
            out[key] = {"step_ms": r["step_ms"],
                        "tiles_per_sec": r["tiles_per_sec"],
                        "compile_s": r["compile_s"],
                        "first_loss": r["first_loss"]}
            # numerics cross-check: both lowerings must be the same math
            # (loud failure, NOT captured into out["errors"])
            base_loss = out.get("vjp_off", {}).get("first_loss")
            if base_loss is not None:
                rtol = 2e-2 if "bf16" in tag else 1e-3
                assert abs(r["first_loss"] - base_loss) <= (
                    rtol * abs(base_loss)), (
                    f"{tag}/{key}: first-step loss {r['first_loss']} "
                    f"vs vjp_off {base_loss} — lowering changed math")
        L.set_conv_s1_custom_vjp(False)
        L.set_conv_s1_wgrad_dot(False)
        base = out.get("vjp_off", {}).get("tiles_per_sec")
        if base:
            for key, *_ in variants[1:]:
                if key in out:
                    out[f"speedup_{key}"] = round(
                        out[key]["tiles_per_sec"] / base, 4)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
