"""Pipelined multi-scene serving.

The reference processes one scene at a time through the library-only
``upscale_dem`` (reference utils/utils.py:1556-1655) — there is no batch
driver at all. Production DEM enhancement is a throughput problem over
thousands of scenes, so this module adds the TPU-idiomatic serving loop
around the device-tiled scene program (eval/scene.py):

  loader thread   : raster decode (load_scene) + pad/pack (prep) for
                    scene i+2 — the pure-host work
  main thread     : device_put + program dispatch for scene i+1 (JAX
                    dispatch is async: the host returns immediately and
                    the chip pipelines upload with scene i's compute)
  writer thread   : blocking device->host read + GeoTIFF write of
                    scene i's meters mosaic

so raster IO, the PCIe/tunnel transfers, the forward compute, and the
output writes all overlap. Same-shape scenes share one compiled program
(eval/scene._RUNNER_CACHE); mixed shapes each compile once.
"""

from __future__ import annotations

import queue
import threading
import time
from pathlib import Path

import numpy as np


def scene_ext(path) -> str:
    """Output raster extension for a scene: mirror the LR-DEM raster's
    format (works for both the flat and the <modality>/<file> subdir
    layouts) so .npy fixtures round-trip without a raster backend."""
    from jspsr_tpu.eval.inference import _SCENE_ALIASES, _find_modality

    path = Path(path)
    if path.is_file():
        return ".npy" if path.suffix == ".npy" else ".tif"
    lr = _find_modality(path, _SCENE_ALIASES["lr_dem"])
    return ".npy" if (lr is not None and lr.suffix == ".npy") else ".tif"


def probe_scene_hw(scene_path):
    """(h, w) of a scene's LR-DEM raster from the header only (no pixel
    read) — the pre-flight input to auto_scene_batch."""
    from jspsr_tpu.data.raster_io import probe_shape
    from jspsr_tpu.eval.inference import _SCENE_ALIASES, _find_modality

    path = Path(scene_path)
    lr = path if path.is_file() else _find_modality(path,
                                                    _SCENE_ALIASES["lr_dem"])
    if lr is None:
        raise FileNotFoundError(f"no LR-DEM raster under {path}")
    return probe_shape(lr)


def auto_scene_batch(hw, tile: int = 128, n_scenes: int | None = None,
                     cap_tiles: int = 176) -> int:
    """Size-aware ``scene_batch`` default from the PERF.md serving sweeps:
    334²-class scenes are upload/dispatch-bound, so batching aggressively
    is safe (sb8 ≈ sb4 ≈ 26 scenes/s bf16 under the ≥3-pass protocol;
    an earlier single-pass sweep read sb8 ahead); 1024²-class scenes
    over-batch past sb2 (sb4 is one 324-tile program + 4-scene upload,
    measured 56 % slower than sb2). Both optima reduce to one rule — the
    largest batch in {8,4,2,1} whose stacked program stays under
    ``cap_tiles`` tiles (72 tiles at 334²/sb8, 162 at 1024²/sb2) — which
    also interpolates monotonically for unmeasured sizes in between.
    ``infer_scene_batch`` in the config overrides the selection."""
    from jspsr_tpu.eval.scene import tile_grid

    h, w = hw
    n_tiles = (tile_grid(max(int(h), tile), tile)[1]
               * tile_grid(max(int(w), tile), tile)[1])
    sb = 8
    while sb > 1 and sb * n_tiles > cap_tiles:
        sb //= 2
    if n_scenes:
        sb = max(1, min(sb, int(n_scenes)))
    return sb


def _compat_key(prepared):
    """Scenes sharing this key can stack into one batched program."""
    return (tuple(prepared.keys), prepared.hw,
            tuple(sorted(prepared.enc.items())), prepared.tile)


def serve_scenes(model, params, bn_state, p, scene_paths, out_dir,
                 tile: int = 128, prefetch: int = 2, mesh=None,
                 scene_batch: int = 1, loader_threads: int = 1):
    """Run device-tiled inference over many scenes with a 3-stage
    pipeline. Returns (list of output paths, elapsed_ms, scenes_per_s).

    ``scene_paths``: scene directories (or single LR-DEM rasters) in the
    load_scene format. Outputs land in ``out_dir/<scene name>_sr.tif``
    (``.npy`` when the scene raster was .npy). Exceptions from any stage
    propagate to the caller after the pipeline drains.

    ``scene_batch`` > 1 stacks that many consecutive same-shape scenes
    into ONE device program (eval/scene.scene_dispatch_batch): at small
    scene sizes upload+dispatch dominate over the tile forward, so
    batching amortizes them. Partial tail groups pad by repeating the
    last scene (outputs dropped); incompatible shapes flush the group.

    ``loader_threads`` > 1 decodes+prepares that many scenes concurrently
    with in-order hand-off — identical grouping/outputs to the serial
    loader (config key ``infer_loader_threads``; default measured in
    PERF.md "serving loader pool").
    """
    from jspsr_tpu.data.raster_io import write_raster
    from jspsr_tpu.eval.inference import load_scene
    from jspsr_tpu.eval.scene import scene_dispatch_batch

    scene_paths = [Path(s) for s in scene_paths]
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    scene_batch = max(1, int(scene_batch))

    loaded: queue.Queue = queue.Queue(maxsize=max(scene_batch, prefetch))
    done: queue.Queue = queue.Queue(maxsize=max(1, prefetch))
    errors: list = []
    out_paths: list = [None] * len(scene_paths)

    def _load_one(i, path):
        from jspsr_tpu.eval.scene import prepare_scene

        sample, profile = load_scene(path, p)
        # pad/pack/validate here so the pure-host prep work overlaps the
        # previous scene's device compute
        return (i, path, prepare_scene(sample, p, tile=tile), profile)

    def loader():
        for i, path in enumerate(scene_paths):
            try:
                item = _load_one(i, path)
            except Exception as e:  # surface after drain
                errors.append(e)
                loaded.put(None)
                return
            loaded.put(item)
        loaded.put(None)

    def loader_pool():
        # ``loader_threads`` > 1: decode+prepare several scenes
        # concurrently (raster codecs + numpy release the GIL), but hand
        # off IN submission order so scene_batch grouping and output
        # naming stay identical to the serial loader. In-flight work is
        # bounded by the pool width; loaded.put blocks on the queue bound.
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        ex = ThreadPoolExecutor(loader_threads)
        window: deque = deque()
        it = iter(enumerate(scene_paths))
        try:
            while True:
                while len(window) <= loader_threads:
                    try:
                        i, path = next(it)
                    except StopIteration:
                        break
                    window.append(ex.submit(_load_one, i, path))
                if not window:
                    break
                loaded.put(window.popleft().result())
        except Exception as e:
            errors.append(e)
            loaded.put(None)
            return
        finally:
            ex.shutdown(wait=False, cancel_futures=True)
        loaded.put(None)

    def writer():
        while True:
            item = done.get()
            if item is None:
                return
            idxs, paths, dev_out, profiles = item
            try:
                arr = np.asarray(dev_out)  # blocks until compute done
                for j, (i, path, profile) in enumerate(
                        zip(idxs, paths, profiles)):
                    out_path = out_dir / f"{path.stem}_sr{scene_ext(path)}"
                    write_raster(out_path, arr[j].astype(np.float32),
                                 dict(profile) if profile else None)
                    out_paths[i] = out_path
            except Exception as e:
                errors.append(e)

    t_loader = threading.Thread(
        target=loader_pool if loader_threads > 1 else loader, daemon=True)
    t_writer = threading.Thread(target=writer, daemon=True)
    t0 = time.perf_counter_ns()
    t_loader.start()
    t_writer.start()
    n_done = 0
    buf: list = []

    def flush():
        nonlocal n_done
        if not buf:
            return True
        group = [b[2] for b in buf]
        if scene_batch > 1:  # pad the tail so one program serves all
            group = group + [group[-1]] * (scene_batch - len(group))
        try:
            dev = scene_dispatch_batch(model, params, bn_state, group, p,
                                       mesh=mesh)
        except Exception as e:
            errors.append(e)
            return False
        done.put(([b[0] for b in buf], [b[1] for b in buf], dev,
                  [b[3] for b in buf]))
        n_done += len(buf)
        buf.clear()
        return True

    ok = True
    while ok:
        item = loaded.get()
        if item is None:
            ok = flush()
            break
        if buf and (_compat_key(item[2]) != _compat_key(buf[0][2])
                    or len(buf) == scene_batch):
            if not flush():
                # drain the loader so it can finish (it may be blocked
                # on a full queue); items are discarded
                while loaded.get() is not None:
                    pass
                break
        buf.append(item)
        if len(buf) == scene_batch:
            if not flush():
                while loaded.get() is not None:
                    pass
                break
    done.put(None)
    t_writer.join()
    t_loader.join()
    elapsed_ms = (time.perf_counter_ns() - t0) // 1000 / 1000
    if errors:
        raise errors[0]
    return out_paths, elapsed_ms, n_done / max(elapsed_ms, 1e-9) * 1000.0


def discover_scenes(batch_dir) -> list:
    """A batch directory holds one subdirectory per scene (each in the
    load_scene layout). Returns the sorted scene dirs; empty if
    ``batch_dir`` itself looks like a single scene."""
    from jspsr_tpu.eval.inference import _SCENE_ALIASES, _find_modality

    batch_dir = Path(batch_dir)
    if not batch_dir.is_dir():
        return []
    if _find_modality(batch_dir, _SCENE_ALIASES["lr_dem"]) is not None:
        return []  # single scene
    scenes = [d for d in sorted(batch_dir.iterdir())
              if d.is_dir()
              and _find_modality(d, _SCENE_ALIASES["lr_dem"]) is not None]
    return scenes
