"""Elevation scaling (reference data/data_utils.py:289-312,441-457).

Two schemes, identical forward/backward round-trip semantics:
- minmax:       y = (x - min) / (max - min)
- log-minmax:   y = log(x - min) / log(max - min) + 1e-8
with optional per-tile relative base (x -> x - base) applied before scaling.

Works on numpy arrays (host pipeline) and jnp arrays (on-device metrics).
"""

from __future__ import annotations

import numpy as np


def scale_data(data, elev_min, elev_max, elev_log: bool = False, base_elev=0.0):
    xp = _mod(data)
    data = data - base_elev if _nonzero(base_elev) else data
    if elev_log:
        return xp.log(data - elev_min) / xp.log(elev_max - elev_min) + 1e-8
    return (data - elev_min) / (elev_max - elev_min)


def descale_data(data, elev_min, elev_max, elev_log: bool = False):
    xp = _mod(data)
    if elev_log:
        return xp.exp(data * np.log(elev_max - elev_min)) + elev_min
    return data * (elev_max - elev_min) + elev_min


def _mod(x):
    if isinstance(x, np.ndarray) or np.isscalar(x):
        return np
    import jax.numpy as jnp

    return jnp


def _nonzero(v):
    try:
        return float(v) != 0.0
    except TypeError:
        return True  # traced/array base: always apply


def modality_scale(kind: str, x, base, *, emin, emax, elog,
                   scale_mask: bool, n_div: int, relative: bool):
    """ToArray's per-modality scaling (data/transforms.py:219-253) on
    device arrays — THE single home of this math, shared by the train
    raw-feed normalizer (make_device_normalize) and the device-tiled
    scene runner (eval/scene.py) so the two paths cannot diverge."""
    import jax.numpy as jnp

    if kind == "lr_dem" or kind == "hr_dem":
        return scale_data(x, emin, emax, elog,
                          base_elev=base if relative else 0.0)
    if kind == "image":
        return x / 255.0
    if kind == "mask" and scale_mask:
        chans = jnp.arange(1, x.shape[-1] + 1, dtype=jnp.float32)
        return x * chans / n_div
    if kind == "canopy":
        return x / 68.0
    return x  # coord / unscaled mask: [0,1] passthrough


def unpack_mask_bits(x, n_ch: int):
    """Inverse of data/loader.pack_mask_np on device: [..., ceil(C/8)]
    big-endian bytes -> [..., C] {0,1} (np.packbits order — channel 0 in
    the MSB). Shift-and-mask fuses into the surrounding elementwise pass."""
    import jax.numpy as jnp

    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (x[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*x.shape[:-1], x.shape[-1] * 8)[..., :n_ch]


def make_device_normalize(p):
    """Jitted on-device batch normalization for the raw-feed train path
    (``device_normalize: true``).

    TPU-idiomatic input pipeline: the host ships RAW crops (uint8 images /
    masks / canopy, float32 DEMs) and this one fused XLA program applies
    what ToArray (data/transforms.py:166-224) does per sample on the host —
    /255 images, log-minmax elevation scaling with the per-scene relative
    base, mask channel scaling, canopy /68. Elementwise work is free on the
    chip (fuses into one pass at HBM bandwidth) and the host loop shrinks
    to decode + crop + stack, which is what a 1-core host can actually
    sustain (scripts/bench_trainer_e2e.py measures the difference).

    Supported case (asserted by the Trainer): per-modality input models
    (JSPSR/LRRU), no stats Normalize list, default [0,1] ranges.

    With ``pack_mask: true`` the mask arrives bit-packed
    (data/loader.pack_mask_np, 8x fewer bytes over the tunnel) and is
    unpacked here in the same fused pass.

    Returns normalize(inputs, gt, base) -> (inputs, gt) with everything
    float32 in [0,1] scale space, identical math to the host path.
    """
    import jax
    import jax.numpy as jnp

    from jspsr_tpu.data.loader import input_kinds

    kinds = input_kinds(p.input_data)
    tk = p.tensor_kwargs or {}
    emin, emax, elog = tk.get("min"), tk.get("max"), tk.get("log", False)
    scale_mask = tk.get("scale_mask", False)
    mask_ch = len(p.get("mask_channel") or list(range(15)))
    n_div = mask_ch + 1
    relative = bool(p.get("relative"))
    pack_mask = bool(p.get("pack_mask"))

    @jax.jit
    def normalize(inputs, gt, base):
        b = base[:, None, None, None]
        out = []
        for x, kind in zip(inputs, kinds):
            if kind == "mask" and pack_mask:
                x = unpack_mask_bits(x, mask_ch)
            out.append(modality_scale(
                kind, x.astype(jnp.float32), b, emin=emin, emax=emax,
                elog=elog, scale_mask=scale_mask, n_div=n_div,
                relative=relative))
        g = modality_scale("hr_dem", gt.astype(jnp.float32), b, emin=emin,
                           emax=emax, elog=elog, scale_mask=scale_mask,
                           n_div=n_div, relative=relative)
        return out, g

    return normalize
