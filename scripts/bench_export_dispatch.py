"""TPU probe: TPU-only export artifact vs in-process under the
deployment-realistic PER-DISPATCH protocol (PERF.md "Exported artifact
vs in-process").

The chained-scan table reads the Pallas-keeping artifact at -5%%, but
inside lax.scan the in-process forward fuses the clip+carry while the
exported call is an opaque fusion boundary. Here the clip is jitted
separately so BOTH arms pay it unfused, one dispatch per batch (the
serving shape): measured parity, +-0.1%% over 2 interleaved rounds.

Usage: python scripts/bench_export_dispatch.py
"""
import sys, os, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(__import__("pathlib").Path(__file__).resolve().parent.parent / ".jax_cache"))
import numpy as np, jax, jax.numpy as jnp
import __graft_entry__ as g
from jspsr_tpu.eval.export import export_inference, load_exported

model, params, bn = g._flagship()
dem, img, msk = g._example_inputs(16, 128, 128)

def fwd(d, i, m):
    pred, _ = model(params, bn, [d, i, m], train=False)
    return pred

jfwd = jax.jit(fwd)
blob = export_inference(model, params, bn, [dem, img, msk], platforms=("tpu",), deform_impl=None)
open("/tmp/ew.stablehlo", "wb").write(blob)
efn = load_exported("/tmp/ew.stablehlo")
clip = jax.jit(lambda x: jnp.clip(x, 0.05, 0.95))

def run(fn, n=40):
    d = dem
    for _ in range(5):
        d = clip(fn(d, img, msk))
    float(d[0, 0, 0, 0])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            d = clip(fn(d, img, msk))
        float(d[0, 0, 0, 0])
        ms = (time.perf_counter() - t0) / n * 1000
        best = ms if best is None else min(best, ms)
    return best

# interleave arms 2x
for rnd in range(2):
    a = run(jfwd); b = run(efn)
    print(f"round{rnd}: inproc {a:.3f} ms/b16  artifact_tpu {b:.3f} ms/b16  gap {(b/a-1)*100:+.1f}%", flush=True)
