"""TPU probe: eval_grouped (horizontally-fused branch blocks) A/B.

scripts/bench_branch_fuse.py measured the grouped FORWARD winning 26% on
the stage-1 64-ch rows in isolation while the grouped gradients lose —
so the lever is eval-only. This is the model-level confirmation: flagship
3-branch eval forward, chained protocol (bench.measure), separate vs
grouped, fp32 and bf16, baseline repeated LAST to bound tunnel drift.

Usage: python scripts/bench_eval_grouped.py [batch]
"""

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from bench import measure  # noqa: E402  (chained lax.scan protocol)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    rows = []
    for tag, kw in (("fp32", {}), ("bf16", {"compute_dtype": "bfloat16"})):
        sep1 = max(measure(batch, **kw))
        grp = max(measure(batch, eval_grouped=True, **kw))
        sep2 = max(measure(batch, **kw))  # drift bound: baseline again
        base = max(sep1, sep2)
        rows.append({"case": f"eval_grouped_{tag}_b{batch}",
                     "sep_tps": round(base, 1),
                     "sep_first": round(sep1, 1), "sep_last": round(sep2, 1),
                     "grouped_tps": round(grp, 1),
                     "speedup": round(grp / base, 3)})
        print(json.dumps(rows[-1]), flush=True)
    Path("/tmp/bench_eval_grouped.json").write_text(json.dumps(rows))


if __name__ == "__main__":
    main()
