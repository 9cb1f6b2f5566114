"""Evaluation loop (reference evaluation/evaluate_utils.py:274-357).

Per batch: jitted forward, loss, on-device meters (computed in meters after
descaling), optional bicubic-input baseline comparison (the reference's
built-in oracle, evaluate_utils.py:324-339), optional GeoTIFF prediction
dump with the preserved geo profile.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import jax.numpy as jnp

from jspsr_tpu import nn
from jspsr_tpu.data.loader import build_batch_inputs
from jspsr_tpu.data.normalize import descale_data
from jspsr_tpu.data.raster_io import HAS_RASTERIO, write_raster
from jspsr_tpu.metrics.meters import PerformanceMeter
from jspsr_tpu.train.early_stop import AverageMeter


def save_prediction(pred, meta, save_dir, tensor_kwargs, base_elev=0.0):
    """Clip to [0,1], descale to meters (+ per-tile base), write raster with
    the sample's geo profile (reference evaluate_utils.py:242-271)."""
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    arr = np.clip(np.asarray(pred), 0.0, 1.0)
    arr = descale_data(arr, tensor_kwargs["min"], tensor_kwargs["max"],
                       tensor_kwargs.get("log", False)) + base_elev
    profile = meta.get("profile") or {}
    suffix = ".tif" if HAS_RASTERIO else ".npy"
    path = save_dir / f"{meta['id']}{suffix}"
    write_raster(path, arr.astype(np.float32), dict(profile))
    return path


def get_visual_id(num_visual: int, num_samples: int, id_visual=None):
    """Sample ids to visualize (reference evaluate_utils.py:154-175):
    -1 -> all; N -> N evenly spaced; id_visual pins one specific id."""
    if num_visual == -1:
        return list(range(num_samples))
    ids = list(np.linspace(0, num_samples - 1, max(num_visual, 0),
                           dtype=int)) if num_visual else []
    if id_visual is not None and 0 <= id_visual < num_samples:
        ids.append(int(id_visual))
    return sorted(set(int(i) for i in ids))


def eval_model(
    p,
    loader,
    eval_step,
    params,
    bn_state,
    criterion=None,
    compare_input: bool = False,
    save_dir=None,
    visual_dir=None,
    verbose: bool = False,
):
    """Returns dict with loss, metric scores, and optional input-baseline
    scores. eval_step: jitted (params, bn_state, inputs, gt) -> (pred, losses)."""
    meter = PerformanceMeter({k: dict(v) for k, v in p.metric.items()})
    meter_in = (
        PerformanceMeter({k: dict(v) for k, v in p.metric.items()})
        if compare_input else None
    )
    loss_meter = AverageMeter("val_loss")
    elev_log = bool(p.tensor_kwargs.get("log", False))
    visual_ids = set()
    if visual_dir is not None and p.get("val_num_visual"):
        visual_ids = set(get_visual_id(p.val_num_visual, len(loader.dataset),
                                       p.get("val_id_visual")))

    sample_idx = 0
    for batch in loader:
        inputs_np, gt_np, base_elev, meta = build_batch_inputs(
            batch, p.model_name, p.input_data
        )
        inputs = [jnp.asarray(x) for x in inputs_np]
        gt = jnp.asarray(gt_np)
        pred, losses = eval_step(params, bn_state, inputs, gt)
        if losses:
            # lazy device scalar — no per-batch host sync
            loss_meter.update(losses["Total"], gt.shape[0])
        meter.update(pred, gt, meta, base_elev, elev_log)
        if meter_in is not None:
            lr_dem = jnp.asarray(batch["lr_dem"])
            if lr_dem.shape[1:3] != gt.shape[1:3]:
                lr_dem = nn.bicubic_resize(lr_dem, gt.shape[1], gt.shape[2])
            meter_in.update(lr_dem, gt, meta, base_elev, elev_log)
        if save_dir is not None:
            for i, m in enumerate(meta):
                save_prediction(
                    np.asarray(pred[i]), m, save_dir, p.tensor_kwargs,
                    base_elev=float(base_elev[i]),
                )
        if visual_ids:
            from jspsr_tpu.eval.visualize import display_predictions

            for i, m in enumerate(meta):
                if sample_idx + i in visual_ids:
                    sample = {k: batch[k][i] for k in
                              ("lr_dem", "hr_dem", "image", "mask", "canopy")
                              if k in batch}
                    display_predictions(
                        sample, np.asarray(pred[i]), dict(p.tensor_kwargs),
                        base_elev=float(base_elev[i]),
                        save_path=Path(visual_dir) / f"{m['id']}.png",
                    )
        sample_idx += len(meta)

    result = {"loss": loss_meter.avg, **meter.get_score(verbose=verbose)}
    if meter_in is not None:
        result["input"] = meter_in.get_score(verbose=verbose)
    return result
