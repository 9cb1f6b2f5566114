"""Deployable inference artifacts via jax.export (StableHLO serialization).

The reference's only deployment story is loading a checkpoint back into the
Python model class (reference utils/utils.py:324-422) — serving requires the
whole training codebase. A TPU-native framework can do better: jax.export
serializes the jitted eval forward, weights baked in as constants, into a
version-stable StableHLO artifact that loads and runs under future jax
releases WITHOUT the model definition, the config system, or the checkpoint
format. One artifact serves CPU and TPU (multi-platform lowering), and the
batch dimension is exported symbolically so the same file serves any batch
size; spatial dims stay static (XLA/TPU want static shapes — export at the
tile size the model serves, eval/scene.py batches tiles for larger scenes).

Contract: the artifact computes the NETWORK forward — per-modality NHWC
float32 inputs in the model's input order, normalized exactly as in
training, returning the normalized prediction. Normalization / descaling
live outside (data/normalize.py, eval/inference.py): they are config
(dataset) concerns, not weights.

The deformable-conv implementation is pinned to the pure-XLA 'mxu'
formulation for the export trace (ops/deform_conv.force_deform_impl):
Pallas TPU custom calls do not serialize portably, and a platform-neutral
trace must not branch on jax.default_backend().
"""

from __future__ import annotations

import contextlib
from pathlib import Path

import jax
from jax import export as _jexport

from jspsr_tpu.ops.deform_conv import force_deform_impl

# bump if the calling convention below changes (flat *inputs -> pred)
ARTIFACT_SUFFIX = ".stablehlo"


def export_inference(model, params, bn_state, example_inputs,
                     platforms=("cpu", "tpu"), batch_symbol="b",
                     deform_impl: str | None = "mxu") -> bytes:
    """Serialize ``model``'s eval forward into a StableHLO artifact.

    example_inputs: list of per-modality arrays (or ShapeDtypeStructs) with
    the deployment spatial shape — only shapes/dtypes are read; the leading
    (batch) dim is replaced by the symbolic dimension ``batch_symbol``.
    Returns the serialized bytes (write with save_exported).

    ``deform_impl``: implementation pinned for the deformable-conv trace.
    The default 'mxu' keeps the artifact platform-neutral (see module
    docstring). ``None`` leaves the backend-dependent auto choice — the
    TPU-ONLY fast variant that keeps the Pallas kernel as a
    ``tpu_custom_call`` (requires ``platforms=("tpu",)``; the custom-call
    stability check is waived, so the artifact is pinned to the libtpu
    generation it was exported under — measured tradeoff in PERF.md
    "Exported artifact vs in-process").
    """
    (b,) = _jexport.symbolic_shape(batch_symbol)
    specs = [jax.ShapeDtypeStruct((b,) + tuple(x.shape[1:]), x.dtype)
             for x in example_inputs]

    def fwd(*inputs):
        pred, _ = model(params, bn_state, list(inputs), train=False)
        return pred

    kwargs = {}
    if deform_impl is None:
        assert tuple(platforms) == ("tpu",), (
            "deform_impl=None (Pallas custom call) serializes a TPU-only "
            "artifact; pass platforms=('tpu',)")
        ctx = contextlib.nullcontext()
        kwargs["disabled_checks"] = [
            _jexport.DisabledSafetyCheck.custom_call("tpu_custom_call")]
    else:
        ctx = force_deform_impl(deform_impl)
    with ctx:
        exported = _jexport.export(
            jax.jit(fwd), platforms=list(platforms), **kwargs)(*specs)
    return bytes(exported.serialize())


def save_exported(path, model, params, bn_state, example_inputs,
                  platforms=("cpu", "tpu"), deform_impl="mxu") -> Path:
    """export_inference + write to ``path`` (suffix normalized).

    ``platforms=("tpu",), deform_impl=None`` writes the TPU-only fast
    variant that keeps the Pallas deformable kernel (config key
    ``export_platforms: [tpu]`` in the CLI flow).
    """
    path = Path(path)
    if path.suffix != ARTIFACT_SUFFIX:
        path = path.with_suffix(path.suffix + ARTIFACT_SUFFIX)
    blob = export_inference(model, params, bn_state, example_inputs,
                            platforms=platforms, deform_impl=deform_impl)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(blob)
    return path


def load_exported(path):
    """Deserialize an artifact -> jitted callable ``fn(*inputs) -> pred``.

    Needs only jax — no model class, config, or checkpoint machinery.
    """
    exported = _jexport.deserialize(bytearray(Path(path).read_bytes()))
    return jax.jit(exported.call)
