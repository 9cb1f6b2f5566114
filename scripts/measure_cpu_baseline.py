"""Measure the CPU-reference throughput for the bench ratio.

BASELINE.json's north star is >=10x the CPU-reference throughput in DEM
tiles/sec/chip. The reference torch pipeline cannot run here (torchvision
absent), so the CPU reference is THIS framework's flagship forward executed
on the host CPU (single process, all cores) — the same network, same tile
protocol. Result is cached in BASELINE_CPU.json (committed).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(batch=8, iters=5, warmup=2):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import __graft_entry__ as g

    model, params, bn_state = g._flagship()
    args = g._example_inputs(batch, 128, 128)

    def fn(dem, img, msk):
        pred, _ = model(params, bn_state, [dem, img, msk], train=False)
        return pred

    jfn = jax.jit(fn)
    for _ in range(warmup):
        jfn(*args)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    tps = batch * iters / dt
    result = {
        "cpu_tiles_per_sec": tps,
        "batch": batch,
        "iters": iters,
        "tile": "128x128 x8 SR (JSPSR 3-branch img+msk)",
    }
    Path(__file__).resolve().parent.parent.joinpath(
        "BASELINE_CPU.json"
    ).write_text(json.dumps(result, indent=2))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
