"""Full-scene inference helpers (reference utils/utils.py:1501-1655).

- mirror-pad a scene up to a power-of-two side so the encoder's /8 strides
  divide evenly (add_padding/remove_padding/cal_pad);
- ``upscale_dem``: normalize one raw sample, run the jitted forward, report
  latency and device peak memory (the reference's only perf probe);
- ``tile_inference``: TPU-native large-scene path — split the scene into an
  overlapping tile grid, run the batched (optionally device-sharded)
  forward over all tiles at once, and feather-blend the results
  (the tile-parallel analogue of sequence parallelism, SURVEY 5.7).
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from jspsr_tpu.config.loader import get_tile
from jspsr_tpu.data.transforms import ToArray, TransformCtx
from jspsr_tpu.eval.mosaic import merge_tiles


def add_padding(img: np.ndarray, n: int) -> np.ndarray:
    """Mirror-pad n pixels on each side (HWC)."""
    return np.pad(img, ((n, n), (n, n), (0, 0)), mode="reflect")


def remove_padding(img: np.ndarray, n: int) -> np.ndarray:
    return img[n:img.shape[0] - n, n:img.shape[1] - n, :]


def cal_pad(img: np.ndarray) -> int:
    """Per-side padding to reach the next power-of-two square side."""
    h, w, _ = img.shape
    side = max(h, w)
    if side & (side - 1) == 0 and h == w:
        return 0
    p = 1
    while p < side:
        p *= 2
    return (p - side) // 2 if (p - side) % 2 == 0 else (p - side + 1) // 2


def _normalize_sample(sample: dict, p) -> dict:
    to_array = ToArray(p.get("normalize"), p.get("mask_channel"),
                       p.get("relative", False),
                       **(p.get("tensor_kwargs") or {}))
    s = dict(sample)
    s.setdefault("meta", {"base": float(np.min(sample["lr_dem"]))
                          if p.get("relative") else 0.0,
                          "id": "scene"})
    return to_array(s, TransformCtx())


def _model_inputs(sample: dict, p):
    order = ["lr_dem"]
    if "image" in sample:
        order.append("image")
    for aux in ("mask", "canopy", "coord"):
        if aux in sample:
            order.append(aux)
    arrays = [sample[k][None] for k in order]  # add batch dim -> NHWC
    if p.model_name.lower() in ("jspsr", "lrru"):
        return [jnp.asarray(a) for a in arrays]
    if p.model_name.lower() == "completionformer":
        return [jnp.asarray(arrays[0]),
                jnp.asarray(np.concatenate(arrays[1:], axis=-1))]
    return [jnp.asarray(np.concatenate(arrays, axis=-1))]


def device_peak_memory_mb() -> float:
    try:
        stats = jax.local_devices()[0].memory_stats()
        return stats.get("peak_bytes_in_use", 0) / 1024 / 1024
    except Exception:
        return float("nan")


def _pad_hwc(img: np.ndarray, pads):
    t, b, l, r = pads
    if not any(pads):
        return img
    h, w, _ = img.shape
    spec = ((t, b), (l, r), (0, 0))
    mode = "reflect" if (t < h and b < h and l < w and r < w) else "edge"
    return np.pad(img, spec, mode=mode)


def pad_to_square_pow2(img: np.ndarray):
    """Pad HWC to the next power-of-two SQUARE side (mirror; edge mode when
    a pad would exceed the reflectable size). Returns (padded, (t, b, l, r)).
    Kept for compatibility — upscale_dem now pads to the encoder stride
    multiple instead (a 1030x2010 scene stays ~1032x2016 rather than
    blowing up to 2048^2 and ~2-4x the HBM)."""
    h, w, _ = img.shape
    side = 1
    while side < max(h, w):
        side *= 2
    dh, dw = side - h, side - w
    pads = (dh // 2, dh - dh // 2, dw // 2, dw - dw // 2)
    return _pad_hwc(img, pads), pads


def model_stride_multiple(p) -> int:
    """Smallest H/W divisor the model's encoder/decoder round-trip needs
    (stride product of the downsampling path): JSPSR/LRRU encoders are
    s1,s2,s2,s2 (/8, models/jspsr.py:120); CompletionFormer's backbone
    goes to dec6 (/32); EDSR never downsamples."""
    return {"jspsr": 8, "lrru": 8, "completionformer": 32,
            "edsr": 1}.get(p.model_name.lower(), 8)


def pads_for_multiple(h: int, w: int, mult: int):
    """(t, b, l, r) pads taking (h, w) to the next multiples of ``mult``."""
    nh = -(-h // mult) * mult if mult > 1 else h
    nw = -(-w // mult) * mult if mult > 1 else w
    dh, dw = nh - h, nw - w
    return (dh // 2, dh - dh // 2, dw // 2, dw - dw // 2)


def pad_to_multiple(img: np.ndarray, mult: int):
    """Pad HWC so each dim is the next multiple of ``mult`` (mirror).
    Returns (padded, (t, b, l, r))."""
    pads = pads_for_multiple(img.shape[0], img.shape[1], mult)
    return _pad_hwc(img, pads), pads


def upscale_dem(forward_fn, sample: dict, p):
    """Run one full scene through the model.

    forward_fn(inputs_list) -> NHWC prediction (pre-jitted).
    Returns (pred HWC in [0,1] scale space, latency_ms, peak_mem_mb).
    """
    s = dict(sample)
    mult = model_stride_multiple(p)
    # pads derive from the LR DEM's shape; every modality shares its HxW
    # (validated in load_scene), so one pad spec applies to all
    h0, w0 = np.asarray(s["lr_dem"]).shape[:2]
    pads = pads_for_multiple(h0, w0, mult)
    for k in list(s):
        if k != "meta":
            s[k] = _pad_hwc(np.asarray(s[k]), pads)
    s = _normalize_sample(s, p)
    inputs = _model_inputs(s, p)

    t0 = time.perf_counter_ns()
    y = forward_fn(inputs)
    y.block_until_ready()
    t_infer = (time.perf_counter_ns() - t0) // 1000 / 1000  # ms
    m_infer = device_peak_memory_mb()

    y = np.asarray(y[0])
    t, b, l, r = pads
    return (y[t:y.shape[0] - b, l:y.shape[1] - r, :], t_infer, m_infer)


def tile_inference(forward_fn, sample: dict, p, tile: int = 128,
                   n_tile: int | None = None):
    """Tile-parallel scene inference: overlapping tile grid -> one batched
    forward (shardable across a device mesh) -> feathered mosaic."""
    s = _normalize_sample(dict(sample), p)
    h, w, _ = s["lr_dem"].shape
    assert h == w, "square scenes only"
    stride, n = get_tile(h, tile, n_tile)
    n_x = int(round(n**0.5))

    keys = [k for k in ("lr_dem", "image", "mask", "canopy", "coord")
            if k in s]
    tiles = {k: [] for k in keys}
    for t in range(n):
        r, c = t // n_x, t % n_x
        for k in keys:
            tiles[k].append(
                s[k][stride * r:stride * r + tile,
                     stride * c:stride * c + tile])
    batches = {k: np.stack(v) for k, v in tiles.items()}

    name = p.model_name.lower()
    if name in ("jspsr", "lrru"):
        inputs = [jnp.asarray(batches[k]) for k in keys]
    elif name == "completionformer":
        inputs = [jnp.asarray(batches["lr_dem"]),
                  jnp.asarray(np.concatenate(
                      [batches[k] for k in keys[1:]], axis=-1))]
    else:
        inputs = [jnp.asarray(np.concatenate(
            [batches[k] for k in keys], axis=-1))]

    pred = np.asarray(forward_fn(inputs))  # (n, tile, tile, 1)
    return merge_tiles([pred[i] for i in range(n)], full_size=h)


# ---------------------------------------------------------------------------
# Scene loading for the CLI --infer flow (reference exposes upscale_dem as a
# library entry only, utils/utils.py:1556-1655; here it is a first-class CLI
# subcommand: python -m jspsr_tpu.cli.main --config c.yml --infer <scene>).

_SCENE_ALIASES = {
    "lr_dem": ("lr_dem", "COP30", "FABDEM"),
    "image": ("image", "BDORTHO"),
    "mask": ("mask", "UA2012"),
    "canopy": ("canopy", "CHM"),
}


def _find_modality(scene_dir, names):
    """A modality raster is <name>.<ext> or <name>/<single file>."""
    from pathlib import Path

    scene_dir = Path(scene_dir)
    for name in names:
        for ext in (".tif", ".tiff", ".npy"):
            f = scene_dir / f"{name}{ext}"
            if f.exists():
                return f
        sub = scene_dir / name
        if sub.is_dir():
            rasters = [f for f in sub.iterdir()
                       if f.suffix in (".tif", ".tiff", ".npy")]
            if len(rasters) == 1:
                return rasters[0]
    return None


def load_scene(path, p):
    """Assemble a raw sample dict for inference.

    ``path`` is either a single LR-DEM raster (dem-only guidance must then
    come from coord channels) or a directory holding one raster per needed
    modality, named by modality (lr_dem/image/mask/canopy) or by the DFC30
    subdir convention (COP30|FABDEM/BDORTHO/UA2012/CHM). Returns
    (sample dict of HWC float arrays, geo profile of the LR DEM).
    """
    from pathlib import Path

    from jspsr_tpu.data.raster_io import read_raster

    path = Path(path)
    need = [k for k in ("image", "mask", "canopy")
            if (p.get("input_data") or {}).get(k)]
    sample = {}
    if path.is_file():
        lr_file = path
    else:
        lr_file = _find_modality(path, _SCENE_ALIASES["lr_dem"])
        assert lr_file is not None, f"no LR DEM raster found under {path}"
    lr, profile = read_raster(lr_file, with_profile=True)
    sample["lr_dem"] = lr.astype(np.float32)

    for key in need:
        assert path.is_dir(), (
            f"model needs '{key}' guidance: pass a scene DIRECTORY "
            f"containing it (got single file {path})")
        f = _find_modality(path, _SCENE_ALIASES[key])
        assert f is not None, f"missing '{key}' raster under {path}"
        arr = read_raster(f)
        if key == "image":
            # ToArray divides images by 255 (transforms.py ToArray, the
            # reference's uint8 convention) — deliver 0-255 here. uint8
            # rasters are decided by DTYPE (a legitimately near-black
            # uint8 image must NOT be rescaled); float rasters are
            # ambiguous — values > 1.5 mean a 0-255-valued float (e.g. a
            # resampled orthophoto), otherwise [0,1]. The config overrides
            # either way via ``infer_image_range: "255" | "unit"``.
            rng_mode = p.get("infer_image_range")
            if rng_mode is None:
                if arr.dtype == np.uint8:
                    rng_mode = "255"
                else:
                    rng_mode = "255" if float(arr.max()) > 1.5 else "unit"
                    print(f"--infer: float image raster {f} assumed "
                          f"{'0-255' if rng_mode == '255' else '[0,1]'}-"
                          f"valued (max={float(arr.max()):.3g}); set "
                          f"infer_image_range to override")
            if arr.dtype != np.uint8:
                arr = arr.astype(np.float32)
                if str(rng_mode) == "unit":
                    arr = arr * 255.0
            # uint8 stays uint8 — the dtype ToArray/the dataset path uses
            # (dfc30 loads orthophotos via cv2 as u8) AND the zero-scan
            # cue for the compact device upload (scene.transfer_encodings)
        elif arr.dtype != np.uint8:
            arr = arr.astype(np.float32)
        assert arr.shape[:2] == sample["lr_dem"].shape[:2], (
            f"'{key}' raster {f} is {arr.shape[:2]} but the LR DEM is "
            f"{sample['lr_dem'].shape[:2]} — all modalities must share the "
            f"LR DEM's grid (resample the raster first)")
        if key == "mask" and p.get("mask_channel"):
            arr = arr[:, :, list(p["mask_channel"])]  # DFC30 dfc30.py:198
        sample[key] = arr

    if (p.get("input_data") or {}).get("coord"):
        from jspsr_tpu.data.dfc30 import DFC30

        sample["coord"] = DFC30._gen_coord(
            sample["lr_dem"], profile, p.get("coord_mode"))
    return sample, profile


def run_scene_inference(model, params, bn_state, p, scene_path, out_path,
                        tile: bool = False):
    """CLI --infer driver: load scene, run, descale to meters, write raster.

    Returns (output path, latency ms, peak device MB)."""
    from pathlib import Path

    from jspsr_tpu.data.normalize import descale_data
    from jspsr_tpu.data.raster_io import write_raster
    from jspsr_tpu.train.step import make_forward

    sample, profile = load_scene(scene_path, p)
    fwd = make_forward(model)

    def forward_fn(inputs):
        return fwd(params, bn_state, inputs)

    tk = p.get("tensor_kwargs") or {}
    base = float(np.min(sample["lr_dem"])) if p.get("relative") else 0.0
    if tile:
        from jspsr_tpu.eval.scene import (device_tiling_supported,
                                          tile_inference_device)

        if device_tiling_supported(p) and p.get("infer_device_tiling", True):
            # device-resident path: normalize/tile/forward/mosaic/descale
            # run in one jitted program; arr arrives already in meters
            arr, t_ms = tile_inference_device(
                model, params, bn_state, sample, p,
                tile=p.get("patch_size", 128))
            mem = device_peak_memory_mb()
            out_path = Path(out_path)
            out_path.parent.mkdir(parents=True, exist_ok=True)
            write_raster(out_path, arr.astype(np.float32), dict(profile))
            return out_path, t_ms, mem
        t0 = time.perf_counter_ns()
        pred = tile_inference(forward_fn, sample, p,
                              tile=p.get("patch_size", 128))
        t_ms = (time.perf_counter_ns() - t0) // 1000 / 1000
        mem = device_peak_memory_mb()
    else:
        pred, t_ms, mem = upscale_dem(forward_fn, sample, p)
    arr = np.clip(np.asarray(pred), 0.0, 1.0)
    arr = descale_data(arr, tk.get("min", -80), tk.get("max", 929),
                       tk.get("log", False)) + base
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    write_raster(out_path, arr.astype(np.float32), dict(profile))
    return out_path, t_ms, mem
