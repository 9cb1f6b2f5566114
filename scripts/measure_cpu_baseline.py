"""Measure the CPU baselines for the bench ratio (VERDICT #4).

BASELINE.json's north star is >=10x the CPU-reference throughput in DEM
tiles/sec/chip. Two baselines are measured and cached in BASELINE_CPU.json:

- ``torch_cpu_tiles_per_sec`` — the ACTUAL PyTorch reference JSPSR 3-branch
  forward (reference models/JSPSR.py:208-380) on host CPU, imported through
  the test oracle's torchvision stub (tests/reference_oracle.py; the stub's
  deform_conv2d is itself golden-verified). This is the honest vs_baseline
  denominator.
- ``cpu_tiles_per_sec`` — THIS framework's flagship forward on host CPU
  (JAX CPU backend), kept for the framework-vs-itself CPU/TPU ratio.

Both run the same protocol: 128x128 tiles, image+mask guidance, eval-mode
forward, fp32, single process.
"""

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def measure_jax_cpu(batch=8, iters=5, warmup=2):
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
    return batch * iters / (time.perf_counter() - t0)


def measure_torch_reference(batch=4, iters=3, warmup=1):
    """The reference torch model on CPU — flagship config from the shipped
    YAMLs (num_feature 32, 2 blocks/stage, spn; configs/jspsr_r8_img_msk.yml)."""
    import numpy as np
    import torch

    from tests.reference_oracle import ref_jspsr

    torch.manual_seed(0)
    tmodel = ref_jspsr(
        in_channels={"lr_dem": 1, "image": 3, "mask": 15},
        out_channels=1, num_feature=32, layers=(2, 2, 2, 2), spn=True,
    )
    tmodel.eval()

    rng = np.random.default_rng(0)
    dem = torch.from_numpy(
        rng.uniform(0.3, 0.7, (batch, 1, 128, 128)).astype(np.float32))
    img = torch.from_numpy(
        rng.uniform(0, 1, (batch, 3, 128, 128)).astype(np.float32))
    msk = torch.from_numpy(
        (rng.uniform(0, 1, (batch, 15, 128, 128)) < 0.1).astype(np.float32))

    with torch.no_grad():
        for _ in range(warmup):
            tmodel(dem, img, msk)
        t0 = time.perf_counter()
        for _ in range(iters):
            tmodel(dem, img, msk)
        dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    torch_tps = measure_torch_reference()
    jax_tps = measure_jax_cpu()
    result = {
        # the honest reference denominator (used by bench.py vs_baseline)
        "torch_cpu_tiles_per_sec": torch_tps,
        # this framework on host CPU (same-network CPU/TPU ratio)
        "cpu_tiles_per_sec": jax_tps,
        "tile": "128x128 x8 SR (JSPSR 3-branch img+msk)",
        "note": "torch number = actual reference models/JSPSR.py forward on "
                "CPU via the golden-verified torchvision stub",
    }
    (ROOT / "BASELINE_CPU.json").write_text(json.dumps(result, indent=2))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
