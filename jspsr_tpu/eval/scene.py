"""Device-resident tiled scene inference.

The reference's large-scene story is host-side: crop overlapping tiles
with TileCrop, forward them one by one, and feather-blend the rasters
back with rioxarray merges (utils/utils.py:802-967,1556-1655). The
round-2 port of that (eval/inference.tile_inference) keeps the tile
assembly and mosaic on the host, which makes the tiled path HOST-bound:
at 1024² the measured end-to-end latency is ~1.6 s while the device
compute for its 81 tiles is ~58 ms (PERF.md "whole-scene inference").

TPU-idiomatic redesign (this module): ship the RAW scene to the chip
once, then ONE jitted XLA program
  1. normalizes every modality in place (the same math as ToArray,
     data/transforms.py:196-253 — log-minmax elevation scaling with the
     scene-relative base, /255 images, mask channel scaling, canopy /68),
  2. gathers the overlapping tile grid with a vmapped dynamic_slice
     (one fused gather per modality),
  3. runs the batched forward over the tiles in fixed-size chunks
     (static Python loop -> one compiled forward reused per chunk,
     bounding peak activation memory for arbitrarily large scenes),
  4. feather-blends the predictions into the full mosaic with a single
     scatter-add using the reference's linear cross-fade weights
     (eval/mosaic.edge_ramp semantics), and
  5. descales the mosaic to meters (+ the relative base).
The host's only work is one upload and one (H, W, 1) download.

Beyond-reference capability: the grid generalizes to ANY scene size
>= the tile side, including rectangles — per-axis grids with a minimum
overlap, mirror-padding only up to the next stride multiple (the host
path asserts the reference's exact-division square protocol).
"""

from __future__ import annotations

import math
import time
from collections import OrderedDict

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from jspsr_tpu.data.normalize import (
    descale_data,
    modality_scale,
    scale_data,
    unpack_mask_bits,
)
from jspsr_tpu.eval.mosaic import edge_ramp


def tile_grid(size: int, tile: int, min_overlap: int = 16):
    """Per-axis overlapping tile grid: (stride, n, padded_size).

    Reproduces the reference grid (config/loader.get_tile, reference
    data_utils.py:170-194) whenever its exact-division constraint holds
    (334 -> stride 103 x3, 1024 -> stride 112 x9), and otherwise picks
    the smallest tile count with >= min_overlap px overlap, padding the
    scene up to the next stride multiple."""
    assert size >= tile, f"scene side {size} < tile {tile}"
    if size == tile:
        return tile, 1, size
    n_x = (size - size % tile) // tile + 1
    if n_x >= 2 and (size - tile) % (n_x - 1) == 0:
        stride = (size - tile) // (n_x - 1)
        if stride < tile:  # reference grid is exact: no padding
            return stride, n_x, size
    n_x = math.ceil((size - tile) / (tile - min_overlap)) + 1
    stride = math.ceil((size - tile) / (n_x - 1))
    return stride, n_x, stride * (n_x - 1) + tile


def grid_weights(tile: int, stride_r: int, n_r: int, stride_c: int,
                 n_c: int) -> np.ndarray:
    """(n_r*n_c, tile, tile) feathering weights for a rect tile grid
    (row-major). Linear cross-fade over each overlap strip; sums to 1
    at every covered pixel by construction (reference utils.py:802-898)."""
    ov_r, ov_c = tile - stride_r, tile - stride_c
    w = np.empty((n_r * n_c, tile, tile), np.float32)
    for r in range(n_r):
        wr = edge_ramp(tile, ov_r, r > 0, r < n_r - 1) if n_r > 1 \
            else np.ones(tile)
        for c in range(n_c):
            wc = edge_ramp(tile, ov_c, c > 0, c < n_c - 1) if n_c > 1 \
                else np.ones(tile)
            w[r * n_c + c] = (wr[:, None] * wc[None, :]).astype(np.float32)
    return w


def device_tiling_supported(p) -> bool:
    """The on-device normalizer replicates ToArray's default surface:
    per-modality [0,1] ranges, no dataset-stats Normalize list."""
    tk = p.get("tensor_kwargs") or {}
    return (not p.get("normalize")
            and tk.get("image_range") != "[-1, 1]"
            and tk.get("label_range") != "[-1, 1]")


def _assemble(tiles: dict, keys: list, model_name: str):
    """Model-family input assembly, mirroring inference._model_inputs
    (reference get_batch_pair, utils/utils.py:152-321)."""
    name = model_name.lower()
    if name in ("jspsr", "lrru"):
        return [tiles[k] for k in keys]
    if name == "completionformer":
        return [tiles["lr_dem"],
                jnp.concatenate([tiles[k] for k in keys[1:]], axis=-1)]
    return [jnp.concatenate([tiles[k] for k in keys], axis=-1)]


def transfer_encodings(sample: dict, keys: list) -> dict:
    """Pick the cheapest exact host->device encoding per modality.

    The scene upload dominates device-tiled latency on a tunneled host
    (~76 B/px fp32 for dem+image+15-ch mask); binary masks bit-pack 8x
    exactly (data/loader.pack_mask_np) and integer-valued 0-255 rasters
    (orthophotos) ride as uint8 — float-valued rasters stay fp32. Returns
    {key: ("f32" | "u8" | "bits", n_channels)}."""
    enc = {}
    for k in keys:
        arr = np.asarray(sample[k])
        c = arr.shape[-1]
        if k == "lr_dem":
            enc[k] = ("f32", c)
        elif arr.dtype == np.uint8:
            # dtype decides (load_scene preserves u8 rasters): at most ONE
            # cheap max-scan for the binary-mask case — float-valued
            # rasters below need several full passes, which at 1024^2 on
            # the 1-core host is tens of ms per scene on the serving path
            if c >= 8 and arr.size and int(arr.max()) <= 1:
                enc[k] = ("bits", c)
            else:
                enc[k] = ("u8", c)
        elif c >= 8 and arr.size and ((arr == 0) | (arr == 1)).all():
            enc[k] = ("bits", c)
        elif (arr.size and float(arr.min()) >= 0 and float(arr.max()) <= 255
              and np.array_equal(arr, arr.astype(np.uint8))):
            enc[k] = ("u8", c)
        else:
            enc[k] = ("f32", c)
    return enc


class PreparedScene:
    """Host-side product of prepare_scene: padded + compact-encoded
    modality arrays ready for upload, plus everything the runner cache
    needs to key on. Building one is the pure-host work (reflect pads,
    packbits, integrality scans) — a serving loop does it in its loader
    thread so it overlaps the previous scene's device compute."""

    __slots__ = ("arrays", "keys", "hw", "enc", "base", "tile",
                 "min_overlap")

    def __init__(self, arrays, keys, hw, enc, base, tile, min_overlap):
        self.arrays = arrays
        self.keys = keys
        self.hw = hw
        self.enc = enc
        self.base = base
        self.tile = tile
        self.min_overlap = min_overlap


def prepare_scene(sample: dict, p, tile: int = 128,
                  min_overlap: int = 16) -> PreparedScene:
    """Validate + pad + compact-encode one raw scene on the host.

    Validates the DEM against the configured elevation range BEFORE
    upload (the device program cannot assert): nodata pixels (-9999 and
    friends) or out-of-range elevations raise here with the scene range
    in the message — the same loud failure ToArray gives the host path
    (data/transforms.py:239-252) instead of silent NaN rasters."""
    keys = [k for k in ("lr_dem", "image", "mask", "canopy", "coord")
            if k in sample]
    dem = np.asarray(sample["lr_dem"])
    hw = dem.shape[:2]
    tk = p.get("tensor_kwargs") or {}
    # one min pass + one max pass — on the 1-core host every full-scene
    # scan is milliseconds on the serving critical path
    lo, hi = float(dem.min()), float(dem.max())
    base = lo if p.get("relative") else 0.0
    with np.errstate(invalid="ignore"):  # nodata -> NaN is the signal
        scaled = scale_data(np.array([lo, hi]), tk.get("min", -80),
                            tk.get("max", 929), tk.get("log", False),
                            base_elev=base)
    if not (np.isfinite(scaled).all()
            and -1e-6 <= scaled[0] and scaled[1] <= 1 + 1e-6):
        raise ValueError(
            f"scene lr_dem range [{lo}, {hi}] (base={base}) falls outside "
            f"the configured elevation range min={tk.get('min', -80)} "
            f"max={tk.get('max', 929)} — nodata pixels? Mask/fill them "
            f"before inference (ToArray would reject this scene too)")

    enc = transfer_encodings(sample, keys)
    pad_r = tile_grid(hw[0], tile, min_overlap)[2] - hw[0]
    pad_c = tile_grid(hw[1], tile, min_overlap)[2] - hw[1]
    arrays = {}
    for k in keys:
        kind = enc[k][0]
        arr = np.asarray(sample[k],
                         np.uint8 if kind in ("u8", "bits") else np.float32)
        if pad_r or pad_c:
            arr = np.pad(arr, ((0, pad_r), (0, pad_c), (0, 0)),
                         mode="reflect")
        if kind == "bits":
            arr = np.packbits(arr, axis=-1)
        arrays[k] = arr
    return PreparedScene(arrays, keys, hw, enc, base, tile, min_overlap)


def make_scene_runner(model, p, keys: list, scene_hw, tile: int = 128,
                      cap: int | None = None, min_overlap: int = 16,
                      mesh=None, encodings: dict | None = None,
                      scene_batch: int = 1):
    """Build the jitted scene program for one scene shape.

    Returns run(params, bn_state, scene_arrays, base) -> the
    (S, H, W, 1) mosaics in METERS (descale + relative base applied,
    matching run_scene_inference's host post-processing order: blend raw
    tile predictions, clip the mosaic to [0,1], then descale). The scene
    arrays come from prepare_scene (padded, compact-encoded), stacked on
    a leading scene axis of size ``scene_batch``; ``base`` is (S,).

    scene_batch > 1 amortizes the per-dispatch cost over S same-shape
    scenes: at small scene sizes the 9-tile forward is single-digit ms
    while upload+dispatch dominate (PERF.md serving table), so batch
    serving stacks scenes into ONE program whose forward sees S·n tiles.

    With ``mesh``, each forward chunk's tile batch is sharded over the
    mesh's data axis (tile-parallel inference, SURVEY §5.7): scene stays
    replicated, the batched forward — where all the FLOPs are — runs
    data-parallel, and GSPMD re-gathers predictions for the mosaic."""
    h, w = scene_hw
    stride_r, n_r, ph = tile_grid(h, tile, min_overlap)
    stride_c, n_c, pw = tile_grid(w, tile, min_overlap)
    n = n_r * n_c  # tiles per scene
    S = int(scene_batch)
    total = S * n
    cap = int(cap or p.get("infer_tile_batch") or 96)
    m = math.ceil(total / cap)
    chunk = math.ceil(total / m)
    if mesh is not None:
        n_dev = mesh.devices.size
        chunk = math.ceil(chunk / n_dev) * n_dev  # shardable chunks
    total_pad = m * chunk

    starts = np.zeros((n, 2), np.int32)
    for t in range(n):
        starts[t] = (stride_r * (t // n_c), stride_c * (t % n_c))
    weights = np.zeros((n, tile, tile, 1), np.float32)
    weights[:, :, :, 0] = grid_weights(tile, stride_r, n_r, stride_c, n_c)
    # Cross-fade ramps sum to 1 wherever exactly two tiles meet (every
    # reference grid); a ceil'd generalized grid can triple-overlap, so
    # normalize by the precomputed weight mosaic (exactly 1.0 on reference
    # grids -> division is an exact identity there).
    wsum = np.zeros((ph, pw, 1), np.float32)
    for t in range(n):
        r0, c0 = starts[t]
        wsum[r0:r0 + tile, c0:c0 + tile] += weights[t]

    tk = p.get("tensor_kwargs") or {}
    emin, emax = tk.get("min", -80), tk.get("max", 929)
    elog = tk.get("log", False)
    scale_mask = tk.get("scale_mask", False)
    n_div = len(p.get("mask_channel") or list(range(15))) + 1
    relative = bool(p.get("relative"))
    enc = encodings or {}

    def normalize(k, x, base):
        # decode the transfer encoding, then the shared ToArray-equivalent
        # scaling (data/normalize.modality_scale — one home for the math,
        # also used by the train raw feed)
        kind, n_ch = enc.get(k, ("f32", None))
        if kind == "bits":
            x = unpack_mask_bits(x, n_ch)
        return modality_scale(
            k, x.astype(jnp.float32), base, emin=emin, emax=emax,
            elog=elog, scale_mask=scale_mask, n_div=n_div,
            relative=relative)

    starts_j = jnp.asarray(starts)
    weights_j = jnp.asarray(weights)
    wsum_j = jnp.asarray(wsum)
    if mesh is not None:
        from jspsr_tpu.parallel.mesh import batch_sharding

        bsh = batch_sharding(mesh)

    @jax.jit
    def run(params, bn_state, scenes: dict, base):
        # scenes[k]: (S, ph, pw, C); base: (S,)
        b4 = base[:, None, None, None]
        norm = {k: normalize(k, v, b4) for k, v in scenes.items()}

        def extract(x):  # (S, ph, pw, C) -> (S*n, tile, tile, C)
            c = x.shape[-1]

            def one_scene(xs):
                def one(s):
                    return lax.dynamic_slice(xs, (s[0], s[1], 0),
                                             (tile, tile, c))

                return jax.vmap(one)(starts_j)  # one fused gather

            t = jax.vmap(one_scene)(x)  # (S, n, tile, tile, C)
            return t.reshape((S * n,) + t.shape[2:])

        inputs = _assemble({k: extract(v) for k, v in norm.items()},
                           keys, p.model_name)
        if total_pad > total:  # fill the last chunk (predictions dropped)
            inputs = [jnp.concatenate(
                [x, jnp.zeros((total_pad - total,) + x.shape[1:], x.dtype)],
                axis=0) for x in inputs]
        preds = []
        for j in range(m):  # static chunk loop: one compiled forward reused
            sl = [x[j * chunk:(j + 1) * chunk] for x in inputs]
            if mesh is not None:
                # tile-batch data parallelism: the forward (all the FLOPs)
                # runs sharded; GSPMD re-gathers for the mosaic scatter
                sl = [lax.with_sharding_constraint(x, bsh) for x in sl]
            preds.append(model(params, bn_state, sl, train=False)[0])
        pred = jnp.concatenate(preds, 0) if m > 1 else preds[0]
        pred = pred[:total].astype(jnp.float32)
        pred = pred.reshape((S, n) + pred.shape[1:]) * weights_j[None]

        ri = (starts_j[:, 0:1] + jnp.arange(tile, dtype=jnp.int32))[:, :, None]
        ci = (starts_j[:, 1:2] + jnp.arange(tile, dtype=jnp.int32))[:, None, :]

        def mosaic(pr):  # (n, tile, tile, 1) -> (ph, pw, 1)
            return jnp.zeros((ph, pw, 1), jnp.float32).at[ri, ci].add(pr)

        out = jax.vmap(mosaic)(pred)  # (S, ph, pw, 1)
        out = jnp.clip((out / wsum_j[None])[:, :h, :w], 0.0, 1.0)
        return descale_data(out, emin, emax, elog) + b4

    return run


# Runner cache: rebuilding make_scene_runner creates a fresh jitted
# function (a fresh XLA program) per call; repeated scenes of one shape
# (benchmark trials, batch CLI runs) must reuse the compiled program.
# Bounded LRU: a long-lived server seeing many shapes (or reloading
# models) must not pin compiled programs + model references forever.
_RUNNER_CACHE: OrderedDict = OrderedDict()
_RUNNER_CACHE_MAX = 8


def scene_dispatch_batch(model, params, bn_state, prepared_list, p,
                         cap: int | None = None, mesh=None):
    """Dispatch S same-shape PreparedScenes through ONE stacked program
    without blocking: returns the on-device (S, H, W, 1) meters mosaics.
    All scenes must share (keys, hw, enc, tile) — group first
    (serve.compatible_key)."""
    first = prepared_list[0]
    S = len(prepared_list)
    assert all(pr.keys == first.keys and pr.hw == first.hw
               and pr.enc == first.enc and pr.tile == first.tile
               for pr in prepared_list), "scene batch must be homogeneous"
    tk = p.get("tensor_kwargs") or {}
    key = (id(model), tuple(first.keys), first.hw, first.tile, cap,
           id(mesh), S, tuple(sorted(first.enc.items())),
           tk.get("min"), tk.get("max"), tk.get("log", False),
           tk.get("scale_mask", False), bool(p.get("relative")),
           len(p.get("mask_channel") or list(range(15))),
           p.get("infer_tile_batch"), p.model_name.lower())
    hit = _RUNNER_CACHE.get(key)
    if hit is None:
        # the entry holds the model/mesh references so their ids cannot
        # be recycled onto different objects while the entry lives
        hit = (model, mesh, make_scene_runner(
            model, p, first.keys, first.hw, tile=first.tile,
            cap=cap, mesh=mesh, encodings=first.enc,
            min_overlap=first.min_overlap, scene_batch=S))
        _RUNNER_CACHE[key] = hit
        if len(_RUNNER_CACHE) > _RUNNER_CACHE_MAX:
            _RUNNER_CACHE.popitem(last=False)
    else:
        _RUNNER_CACHE.move_to_end(key)
    run = hit[2]
    # S=1 (the single-scene hot path): arr[None] is a zero-copy VIEW;
    # np.stack would memcpy every modality (~9 MB at 1024^2 — tens of ms
    # on the 1-core host, measured as the round-3 -> round-4 scene
    # latency regression)
    if S == 1:
        stacked = {k: prepared_list[0].arrays[k][None]
                   for k in first.keys}
    else:
        stacked = {k: np.stack([pr.arrays[k] for pr in prepared_list])
                   for k in first.keys}
    base = np.asarray([pr.base for pr in prepared_list], np.float32)
    return run(params, bn_state, jax.device_put(stacked),
               jnp.asarray(base))


def scene_dispatch(model, params, bn_state, sample, p,
                   tile: int = 128, cap: int | None = None, mesh=None):
    """Dispatch one scene through the device-tiled program WITHOUT
    blocking: returns the on-device (H, W, 1) meters mosaic (a jax array
    whose computation is enqueued). The caller reads it with np.asarray
    when ready — the separation lets a serving loop overlap the next
    scene's host prep/upload with this scene's compute
    (eval/serve.serve_scenes).

    ``sample`` is a raw scene dict OR an already-built PreparedScene
    (serving loops prepare in their loader thread)."""
    prepared = (sample if isinstance(sample, PreparedScene)
                else prepare_scene(sample, p, tile=tile))
    out = scene_dispatch_batch(model, params, bn_state, [prepared], p,
                               cap=cap, mesh=mesh)
    return out[0]


def tile_inference_device(model, params, bn_state, sample: dict, p,
                          tile: int = 128, cap: int | None = None,
                          mesh=None):
    """End-to-end device-tiled scene inference.

    Returns (dem_meters (H, W, 1) float32 np, latency_ms) — latency is
    true end-to-end: scene upload + compute + mosaic download (the
    compile, first call per shape, is excluded by the caller timing a
    second call, as scripts/bench_infer_scene.py does)."""
    t0 = time.perf_counter_ns()
    out = scene_dispatch(model, params, bn_state, sample, p,
                         tile=tile, cap=cap, mesh=mesh)
    out.block_until_ready()
    t_ms = (time.perf_counter_ns() - t0) // 1000 / 1000
    return np.asarray(out), t_ms
