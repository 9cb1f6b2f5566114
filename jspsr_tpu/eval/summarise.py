"""Whole-split evaluation summary (reference utils/utils.py:970-1497).

Two views over the saved predictions of a validation run:

- **online**: per-patch metrics (meters domain) averaged over patches —
  matches the live PerformanceMeter protocol;
- **offline**: pooled-pixel metrics over the whole split; for tiled (r3)
  datasets the 9 border-cropped tiles are first feather-merged back into
  full scenes (eval.mosaic).

Both views compare the SR prediction AND the public input products
(COP30/FABDEM, + FATHOM where present) against the RGEALTI ground truth —
the reference's built-in oracles. PSNR uses the DEM convention
20*log10(elev_max / RMSE) (reference utils.py:1353-1356).

Optionally writes error-distribution KDE plots (seaborn, if available) and
a summary JSON/CSV.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from jspsr_tpu.data.raster_io import read_raster


def _stats(err: np.ndarray, elev_max: float) -> dict:
    err = err[np.isfinite(err)]
    rmse = float(np.sqrt(np.mean(err**2)))
    med = float(np.median(err))
    nmad = float(1.4826 * np.median(np.abs(err - np.median(err))))
    le95 = float(np.quantile(np.abs(err), 0.95))
    psnr = float(20 * np.log10(elev_max / rmse)) if rmse > 0 else float("inf")
    return {"RMSE": rmse, "Median": med, "NMAD": nmad, "LE95": le95,
            "PSNR": psnr}


def _crop(a: np.ndarray, border: float) -> np.ndarray:
    if not border:
        return a
    h, w = a.shape[:2]
    bh, bw = int(h * border), int(w * border)
    return a[bh:h - bh, bw:w - bw]


def merge_tiled_predictions(pred_files: dict, tiles_per_scene: int,
                            full_size: int, save_dir=None):
    """Group per-tile predictions '<scene_id>_<t>' into full scenes via the
    feathered mosaic (reference merge_dem, utils/utils.py:914-967).
    Returns {scene_id: path-or-array}."""
    from collections import defaultdict

    from jspsr_tpu.data.raster_io import write_raster
    from jspsr_tpu.eval.mosaic import merge_tiles

    groups = defaultdict(dict)
    for sid, path in pred_files.items():
        base, _, t = str(sid).rpartition("_")
        groups[base][int(t)] = path
    merged = {}
    for base, tiles in groups.items():
        assert len(tiles) == tiles_per_scene, (base, sorted(tiles))
        arrs = [np.squeeze(read_raster(tiles[t]))
                for t in range(tiles_per_scene)]
        scene = merge_tiles(arrs, full_size=full_size)
        if save_dir is not None:
            path = Path(save_dir) / f"{base}.npy"
            write_raster(path, scene.astype(np.float32))
            merged[base] = path
        else:
            merged[base] = scene
    return merged


def summarise_evaluation(
    pred_files: dict,
    gt_files: dict,
    baseline_files: dict | None = None,
    elev_max: float = 929.0,
    border: float = 0.0,
    save_dir=None,
    plots: bool = False,
    tiles_per_scene: int | None = None,
    full_size: int | None = None,
):
    """pred_files / gt_files: {sample_id: path}; baseline_files:
    {product_name: {sample_id: path}}. With tiles_per_scene/full_size set
    (the r3 protocol: 9 tiles, 334), per-tile predictions are feather-merged
    into full scenes first. Returns {'online': ..., 'offline': ...}."""
    if tiles_per_scene and tiles_per_scene > 1:
        pred_files = merge_tiled_predictions(
            pred_files, tiles_per_scene, full_size,
            save_dir=Path(save_dir) / "mosaics" if save_dir else None,
        )
    ids = sorted(set(pred_files) & set(gt_files))
    assert ids, "no overlapping prediction/gt ids"
    products = {"SR": pred_files}
    for name, files in (baseline_files or {}).items():
        products[name] = files

    per_patch = {name: [] for name in products}
    pooled = {name: [] for name in products}
    for sid in ids:
        gt = _crop(np.squeeze(read_raster(gt_files[sid])), border)
        for name, files in products.items():
            if sid not in files:
                continue
            src = files[sid]
            arr = np.squeeze(
                src if isinstance(src, np.ndarray) else read_raster(src)
            ).astype(np.float64)
            if name != "SR":
                arr = _crop(arr, border)
            if arr.shape != gt.shape:  # SR predictions may be pre-cropped
                g = gt if arr.shape == gt.shape else _crop_to(arr, gt)
                err = (arr - g).ravel()
            else:
                err = (arr - gt).ravel()
            per_patch[name].append(_stats(err, elev_max))
            pooled[name].append(err)

    online = {
        name: {k: float(np.mean([s[k] for s in stats]))
               for k in stats[0]} if stats else {}
        for name, stats in per_patch.items()
    }
    offline = {
        name: _stats(np.concatenate(errs), elev_max) if errs else {}
        for name, errs in pooled.items()
    }
    result = {"online": online, "offline": offline, "n_samples": len(ids)}

    if save_dir is not None:
        save_dir = Path(save_dir)
        save_dir.mkdir(parents=True, exist_ok=True)
        (save_dir / "summary.json").write_text(
            json.dumps(result, indent=2)
        )
        if plots:
            _plot_error_distributions(pooled, save_dir)
    return result


def _crop_to(small: np.ndarray, big: np.ndarray) -> np.ndarray:
    """Center-crop ``big`` to ``small``'s shape."""
    dh = (big.shape[0] - small.shape[0]) // 2
    dw = (big.shape[1] - small.shape[1]) // 2
    return big[dh:dh + small.shape[0], dw:dw + small.shape[1]]


def _plot_error_distributions(pooled: dict, save_dir: Path):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import seaborn as sns
    except Exception:
        return
    fig, ax = plt.subplots(figsize=(8, 5))
    for name, errs in pooled.items():
        if not errs:
            continue
        sample = np.concatenate(errs)
        if sample.size > 200_000:
            sample = np.random.default_rng(0).choice(sample, 200_000,
                                                     replace=False)
        sns.kdeplot(sample, ax=ax, label=name, clip=(-10, 10))
    ax.set_xlabel("elevation error (m)")
    ax.legend()
    fig.tight_layout()
    fig.savefig(save_dir / "error_kde.png", dpi=120)
    plt.close(fig)
