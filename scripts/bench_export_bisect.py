"""TPU probe: equality bisect for the export artifact (PERF.md
"Exported artifact vs in-process", measurement footnote).

Shows jit-vs-jit native / portable-artifact / TPU-only-artifact are all
BIT-EXACT against each other, while eager-vs-jit differs ~1.6%% rel =
exactly the default-matmul-precision-vs-fp32-pinned delta: TPU eager
dispatch executes convs at a different effective precision than jitted
DEFAULT. Equality claims on TPU must compare jitted programs.

Usage: python scripts/bench_export_bisect.py
"""
import sys, os
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(__import__("pathlib").Path(__file__).resolve().parent.parent / ".jax_cache"))
import numpy as np, jax, jax.numpy as jnp
import __graft_entry__ as g
from jspsr_tpu.eval.export import export_inference, load_exported
from jspsr_tpu.ops.deform_conv import force_deform_impl

model, params, bn = g._flagship()
dem, img, msk = g._example_inputs(16, 128, 128)

def fwd(d, i, m):
    pred, _ = model(params, bn, [d, i, m], train=False)
    return pred

def fwd_mxu(d, i, m):
    with force_deform_impl("mxu"):
        return fwd(d, i, m)

def diff(a, b, tag):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    d = np.abs(a - b)
    print(f"{tag}: max_abs={d.max():.3e} max_rel={(d/ (np.abs(b)+1e-9)).max():.3e}", flush=True)

a = jax.jit(fwd_mxu)(dem, img, msk)

# native-vs-native: same math, different program (extra no-op epilogue)
def fwd_mxu2(d, i, m):
    return fwd_mxu(d, i, m) * jnp.float32(1.0) + jnp.float32(0.0)
b = jax.jit(fwd_mxu2)(dem, img, msk)
diff(a, b, "native vs native(noop-epilogue)")

blob = export_inference(model, params, bn, [dem, img, msk])
open("/tmp/e.stablehlo", "wb").write(blob)
c = load_exported("/tmp/e.stablehlo")(dem, img, msk)
diff(a, c, "native vs artifact(cpu+tpu,mxu)")

blob2 = export_inference(model, params, bn, [dem, img, msk], platforms=("tpu",))
open("/tmp/e2.stablehlo", "wb").write(blob2)
d2 = load_exported("/tmp/e2.stablehlo")(dem, img, msk)
diff(a, d2, "native vs artifact(tpu-only,mxu)")
diff(c, d2, "artifact(cpu+tpu) vs artifact(tpu-only)")

# pin fp32 matmul precision at trace time: native vs artifact again
with jax.default_matmul_precision("float32"):
    a32 = jax.jit(fwd_mxu)(dem, img, msk)
    blob3 = export_inference(model, params, bn, [dem, img, msk])
    open("/tmp/e3.stablehlo", "wb").write(blob3)
    c32 = load_exported("/tmp/e3.stablehlo")(dem, img, msk)
diff(a32, c32, "fp32-pinned: native vs artifact")
diff(a, a32, "native default-prec vs native fp32-pinned")
