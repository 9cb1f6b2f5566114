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

from pathlib import Path

import jax
from jax import export as _jexport

from jspsr_tpu.ops.deform_conv import force_deform_impl

# bump if the calling convention below changes (flat *inputs -> pred)
ARTIFACT_SUFFIX = ".stablehlo"


def export_inference(model, params, bn_state, example_inputs,
                     platforms=("cpu", "tpu"), batch_symbol="b") -> bytes:
    """Serialize ``model``'s eval forward into a StableHLO artifact.

    example_inputs: list of per-modality arrays (or ShapeDtypeStructs) with
    the deployment spatial shape — only shapes/dtypes are read; the leading
    (batch) dim is replaced by the symbolic dimension ``batch_symbol``.
    Returns the serialized bytes (write with save_exported).
    """
    (b,) = _jexport.symbolic_shape(batch_symbol)
    specs = [jax.ShapeDtypeStruct((b,) + tuple(x.shape[1:]), x.dtype)
             for x in example_inputs]

    def fwd(*inputs):
        pred, _ = model(params, bn_state, list(inputs), train=False)
        return pred

    with force_deform_impl("mxu"):
        exported = _jexport.export(
            jax.jit(fwd), platforms=list(platforms))(*specs)
    return bytes(exported.serialize())


def save_exported(path, model, params, bn_state, example_inputs,
                  platforms=("cpu", "tpu")) -> Path:
    """export_inference + write to ``path`` (suffix normalized)."""
    path = Path(path)
    if path.suffix != ARTIFACT_SUFFIX:
        path = path.with_suffix(path.suffix + ARTIFACT_SUFFIX)
    blob = export_inference(model, params, bn_state, example_inputs,
                            platforms=platforms)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(blob)
    return path


def load_exported(path):
    """Deserialize an artifact -> jitted callable ``fn(*inputs) -> pred``.

    Needs only jax — no model class, config, or checkpoint machinery.
    """
    exported = _jexport.deserialize(bytearray(Path(path).read_bytes()))
    return jax.jit(exported.call)
