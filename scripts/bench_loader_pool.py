"""TPU probe: serving loader pool A/B (eval/serve.py loader_threads).

The 334² pipelined serving loop is host-bound: the sb8 bf16 arm's
~29 ms/scene budget must cover raster decode + prepare_scene in ONE
loader thread while the 9-tile forward is ~6 ms. ``loader_threads`` > 1
decodes+prepares scenes concurrently (in-order hand-off, identical
outputs — tests/test_serve.py). This measures whether the pool actually
buys throughput on the 1-core host (GIL + single core may eat it), with
interleaved arms so tunnel drift hits both equally.

Arms: loader_threads 1 vs 2 vs 4 at 334² sb8 bf16 (the README headline
arm) and 1024² sb2 fp32 (the large-scene recommendation), N passes each.

Usage: python scripts/bench_loader_pool.py [n_passes]
"""

import json
import os
import sys
import tempfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))


def run_case(size, n, sb, compute_dtype, threads_arms, passes):
    import __graft_entry__ as g
    from jspsr_tpu.eval.serve import serve_scenes
    from scripts.bench_serve_scenes import make_p, write_scenes

    model, params, bn_state = g._flagship(compute_dtype=compute_dtype)
    p = make_p(compute_dtype)
    out = {lt: [] for lt in threads_arms}
    with tempfile.TemporaryDirectory() as td:
        scenes = write_scenes(Path(td) / "scenes", n, size)
        serve_scenes(model, params, bn_state, p, scenes[:sb],
                     Path(td) / "warm", scene_batch=sb)  # compile warm-up
        for ps in range(passes):
            for lt in threads_arms:  # interleaved: drift hits all arms
                _, _, sps = serve_scenes(
                    model, params, bn_state, p, scenes,
                    Path(td) / f"run{ps}_{lt}", scene_batch=sb,
                    loader_threads=lt)
                out[lt].append(round(sps, 2))
                print(f"# {size}² sb{sb} lt{lt} pass{ps}: {sps:.2f} "
                      f"scenes/s", flush=True)
    return out


def main():
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    res = {
        "serve_334_bf16_sb8": run_case(334, 16, 8, "bfloat16",
                                       (1, 2, 4), passes),
        "serve_1024_fp32_sb2": run_case(1024, 6, 2, None, (1, 2), passes),
    }
    print(json.dumps(res))
    Path("/tmp/bench_loader_pool.json").write_text(json.dumps(res))


if __name__ == "__main__":
    main()
