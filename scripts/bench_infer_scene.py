"""TPU probe: full-scene inference latency + peak device memory.

The reference's ONLY perf instrument is the ad-hoc ms / peak-MB timer
wrapped around one whole-scene forward (utils/utils.py:1630-1636, inside
``upscale_dem``). This benchmark is its first-class analogue: the flagship
3-branch JSPSR at real scene sizes, whole-scene (`upscale_dem`, pads to
the encoder stride multiple) and tile-parallel (`tile_inference`,
feathered 128-tile mosaic), fp32 and bf16 bodies, best-of-N with spread.

One process, sequential sizes (each size is one XLA program). Run on the
v5e; writes JSON lines + a markdown table for PERF.md.
"""

import json
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))

import numpy as np

N_TRIALS = 5


def make_scene(size: int, seed: int = 0) -> dict:
    """Synthetic raw sample at DFC30-like value ranges (HWC float32)."""
    from jspsr_tpu.data.synthetic import _fractal_terrain

    rng = np.random.default_rng(seed)
    dem = _fractal_terrain(rng, size).astype(np.float32)[..., None]
    # uint8 rasters, exactly what load_scene delivers from disk (it
    # preserves u8 dtypes so transfer_encodings never scans float arrays)
    img = rng.integers(0, 256, (size, size, 3)).astype(np.uint8)
    cls = rng.integers(0, 15, (size, size))
    mask = np.eye(15, dtype=np.uint8)[cls]  # binary one-hot (dfc30.py)
    return {"lr_dem": dem, "image": img, "mask": mask}


def make_p(compute_dtype=None):
    from jspsr_tpu.config.loader import AttrDict

    return AttrDict({
        "model_name": "JSPSR", "relative": True,
        "input_data": {"COP30": 1, "image": 3, "mask": 15},
        "tensor_kwargs": {"log": True, "min": -80, "max": 929,
                          "scale_mask": True},
        "patch_size": 128,
        "compute_dtype": compute_dtype,
    })


def main():
    import jax

    import __graft_entry__ as g
    from jspsr_tpu.eval.inference import (device_peak_memory_mb,
                                          tile_inference, upscale_dem)
    from jspsr_tpu.train.step import make_forward

    sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [334, 512, 1024]
    rows = []
    for dtype_tag, cdt in (("fp32", None), ("bf16", "bfloat16")):
        model, params, bn_state = g._flagship(compute_dtype=cdt)
        fwd = make_forward(model)
        p = make_p(cdt)

        def forward_fn(inputs):
            return fwd(params, bn_state, inputs)

        dev_only = os.environ.get("BENCH_DEV_TILED_ONLY") == "1"
        for size in sizes:
            if dev_only:
                break
            sample = make_scene(size)
            times = []
            for _ in range(N_TRIALS + 1):  # first trial compiles
                _, ms, mem = upscale_dem(forward_fn, sample, p)
                times.append(ms)
            best, worst = min(times[1:]), max(times[1:])
            rows.append({"case": f"scene_{size}_{dtype_tag}",
                         "ms": round(best, 1), "ms_max": round(worst, 1),
                         "peak_mb": round(mem, 0),
                         "mpix_per_s": round(size * size / best / 1e3, 2)})
            print(json.dumps(rows[-1]), flush=True)

        # tile-parallel path at the largest size (one batched forward over
        # the overlapping 128-tile grid + feathered mosaic on host)
        size = max(sizes)
        if size <= 128:  # smoke-test sizes: no tile grid fits
            continue
        sample = make_scene(size)
        import time as _t
        if not dev_only:
            times = []
            for _ in range(N_TRIALS + 1):
                t0 = _t.perf_counter()
                tile_inference(forward_fn, sample, p, tile=128)
                times.append((_t.perf_counter() - t0) * 1000)
            best, worst = min(times[1:]), max(times[1:])
            rows.append({"case": f"tiled_{size}_{dtype_tag}",
                         "ms": round(best, 1), "ms_max": round(worst, 1),
                         "peak_mb": round(device_peak_memory_mb(), 0),
                         "mpix_per_s": round(size * size / best / 1e3, 2)})
            print(json.dumps(rows[-1]), flush=True)

        # device-resident tiled path (eval/scene.py): raw scene upload +
        # one jitted normalize/tile/forward/mosaic/descale program
        from jspsr_tpu.eval.scene import tile_inference_device

        times = []
        for _ in range(N_TRIALS + 1):
            _, ms = tile_inference_device(model, params, bn_state,
                                          sample, p, tile=128)
            times.append(ms)
        best, worst = min(times[1:]), max(times[1:])
        rows.append({"case": f"dev_tiled_{size}_{dtype_tag}",
                     "ms": round(best, 1), "ms_max": round(worst, 1),
                     "peak_mb": round(device_peak_memory_mb(), 0),
                     "mpix_per_s": round(size * size / best / 1e3, 2)})
        print(json.dumps(rows[-1]), flush=True)

    print("\n| case | best ms | max ms | peak MB | Mpix/s |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['case']} | {r['ms']} | {r['ms_max']} | "
              f"{r['peak_mb']:.0f} | {r['mpix_per_s']} |")
    Path("/tmp/bench_infer_scene.json").write_text(json.dumps(rows))


if __name__ == "__main__":
    main()
