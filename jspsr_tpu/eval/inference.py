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


def upscale_dem(forward_fn, sample: dict, p):
    """Run one full scene through the model.

    forward_fn(inputs_list) -> NHWC prediction (pre-jitted).
    Returns (pred HWC in [0,1] scale space, latency_ms, peak_mem_mb).
    """
    pad = cal_pad(sample["lr_dem"])
    s = dict(sample)
    if pad > 0:
        for k in list(s):
            if k != "meta":
                s[k] = add_padding(np.asarray(s[k]), pad)
    s = _normalize_sample(s, p)
    inputs = _model_inputs(s, p)

    t0 = time.perf_counter_ns()
    y = forward_fn(inputs)
    y.block_until_ready()
    t_infer = (time.perf_counter_ns() - t0) // 1000 / 1000  # ms
    m_infer = device_peak_memory_mb()

    y = np.asarray(y[0])
    if pad > 0:
        y = remove_padding(y, pad)
    return y, t_infer, m_infer


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
