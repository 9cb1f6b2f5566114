"""TPU probe: multi-scene serving throughput (eval/serve.py).

The reference has no batch-inference driver at all (one library call per
scene, utils/utils.py:1556). This measures the pipelined serving loop
(loader thread -> async dispatch -> writer thread) against a sequential
load->infer->write loop over the same scenes, flagship 3-branch JSPSR,
device-tiled route, fp32 and bf16. Scenes are written to disk first so
the serial arm pays the same raster IO.

Usage: python scripts/bench_serve_scenes.py [size] [n_scenes]
"""

import json
import os
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))

import numpy as np


def make_p(compute_dtype=None):
    from jspsr_tpu.config.loader import AttrDict

    return AttrDict({
        "model_name": "JSPSR", "relative": True,
        "input_data": {"COP30": 1, "image": 3, "mask": 15},
        "tensor_kwargs": {"log": True, "min": -80, "max": 929,
                          "scale_mask": True},
        "patch_size": 128, "mask_channel": None,
        "compute_dtype": compute_dtype,
    })


def write_scenes(root: Path, n: int, size: int):
    from jspsr_tpu.data.raster_io import write_raster
    from jspsr_tpu.data.synthetic import _fractal_terrain

    rng = np.random.default_rng(0)
    for i in range(n):
        d = root / f"scene{i:03d}"
        d.mkdir(parents=True)
        dem = _fractal_terrain(rng, size).astype(np.float32)[..., None]
        img = rng.integers(0, 256, (size, size, 3)).astype(np.uint8)
        cls = rng.integers(0, 15, (size, size))
        mask = np.eye(15, dtype=np.uint8)[cls]
        write_raster(d / "lr_dem.npy", dem)
        write_raster(d / "image.npy", img)
        write_raster(d / "mask.npy", mask)
    return sorted(root.iterdir())


def main():
    import __graft_entry__ as g
    from jspsr_tpu.eval.inference import load_scene
    from jspsr_tpu.eval.scene import tile_inference_device
    from jspsr_tpu.eval.serve import serve_scenes
    from jspsr_tpu.data.raster_io import write_raster

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 334
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    sbs = (tuple(int(x) for x in sys.argv[3].split(","))
           if len(sys.argv) > 3 else (1, 4))

    rows = []
    with tempfile.TemporaryDirectory() as td:
        scenes = write_scenes(Path(td) / "scenes", n, size)
        for tag, cdt in (("fp32", None), ("bf16", "bfloat16")):
            model, params, bn_state = g._flagship(compute_dtype=cdt)
            p = make_p(cdt)

            # warm-up: compile the runner once
            sample, _ = load_scene(scenes[0], p)
            tile_inference_device(model, params, bn_state, sample, p)

            # serial arm: load -> infer (blocking) -> write, per scene
            out_s = Path(td) / f"serial_{tag}"
            out_s.mkdir()
            t0 = time.perf_counter()
            for s in scenes:
                sample, prof = load_scene(s, p)
                arr, _ = tile_inference_device(model, params, bn_state,
                                               sample, p)
                write_raster(out_s / f"{s.name}_sr.npy",
                             arr.astype(np.float32), dict(prof))
            serial_ms = (time.perf_counter() - t0) * 1000

            # pipelined arm + scene-batched arms (one program per S
            # consecutive same-shape scenes); first run warms the compile
            # (scene_batch programs are per-S), second run is the number
            for sb in sbs:
                serve_scenes(model, params, bn_state, p,
                             scenes[:sb], Path(td) / f"warm_{tag}_{sb}",
                             scene_batch=sb)
                _, pipe_ms, sps = serve_scenes(
                    model, params, bn_state, p, scenes,
                    Path(td) / f"pipe_{tag}_{sb}", scene_batch=sb)
                rows.append({
                    "case": f"serve_{size}_{tag}_sb{sb}", "n": n,
                    "serial_ms_per_scene": round(serial_ms / n, 1),
                    "pipelined_ms_per_scene": round(pipe_ms / n, 1),
                    "scenes_per_s": round(sps, 2),
                    "speedup": round(serial_ms / pipe_ms, 2),
                })
                print(json.dumps(rows[-1]), flush=True)

    print("\n| case | serial ms/scene | pipelined ms/scene | scenes/s | speedup |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['case']} (n={r['n']}) | {r['serial_ms_per_scene']} | "
              f"{r['pipelined_ms_per_scene']} | {r['scenes_per_s']} | "
              f"{r['speedup']}x |")
    Path("/tmp/bench_serve_scenes.json").write_text(json.dumps(rows))


if __name__ == "__main__":
    main()
