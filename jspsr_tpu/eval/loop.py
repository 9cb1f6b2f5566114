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
from jspsr_tpu.data.normalize import descale_data, scale_data
from jspsr_tpu.data.raster_io import HAS_RASTERIO, write_raster
from jspsr_tpu.metrics.meters import PerformanceMeter
from jspsr_tpu.parallel.mesh import pad_batch_to, replicate_state, shard_batch
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


def _host_view_sample(sample: dict, tk: dict, base: float) -> dict:
    """Normalize a RAW crop for display_predictions (raw-feed eval): DEMs
    log-minmax scaled with the per-tile base, image /255, canopy /68 —
    the subset of ToArray's math the visual panels consume."""
    out = {}
    for k, v in sample.items():
        v = np.asarray(v)
        if "dem" in k:
            v = scale_data(v.astype(np.float32), tk["min"], tk["max"],
                           tk.get("log", False), base_elev=base)
        elif k == "image":
            v = v.astype(np.float32) / 255.0
        elif k == "canopy":
            v = v.astype(np.float32) / 68.0
        out[k] = v
    return out


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
    mesh=None,
    normalize=None,
):
    """Returns dict with loss, metric scores, and optional input-baseline
    scores. eval_step: jitted (params, bn_state, inputs, gt) -> (pred, losses).

    ``mesh``: optional device mesh — batches are placed batch-sharded over
    its 'data' axis so the batched fast path runs data-parallel on every
    chip (requires valid_batch_size divisible by the mesh size; the padded
    remainder batch keeps the same compiled shape). Metric semantics are
    unchanged: meters reduce per sample on device, so sharded scores equal
    single-device scores (verified in tests/test_train.py and
    tests/test_eval_batched.py mesh-sharded cases).

    ``normalize``: raw-feed device normalizer (``device_normalize: true`` —
    data/normalize.make_device_normalize). When set, the loader ships RAW
    crops (the eval transform skips host ToArray) and this one fused
    on-device program scales inputs AND gt before eval_step — identical
    math, 4x fewer host->device bytes (8x on the mask with ``pack_mask``).
    The bicubic input baseline and visual panels are scaled to match."""
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

    # Batched-eval fast path: any valid_batch_size works. Meters compute
    # per-sample reductions (identical averages to the reference's bs=1
    # protocol), the remainder batch is padded to the compiled batch shape
    # (one XLA program regardless of dataset size) and padded samples are
    # dropped via n_valid.
    batch_cfg = int(p.get("valid_batch_size", 1) or 1)
    if mesh is not None and batch_cfg % mesh.devices.size != 0:
        mesh = None  # batch not divisible across chips -> single-device
    if mesh is not None:
        # params may live on a DIFFERENT mesh (e.g. the Trainer replicated
        # them over its own data mesh); jit rejects mixed device sets, so
        # re-replicate onto the eval mesh
        params, bn_state = replicate_state(mesh, (params, bn_state))
    mask_idx = None
    if normalize is not None and p.get("pack_mask"):
        from jspsr_tpu.data.loader import input_kinds, pack_mask_np

        kinds = input_kinds(p.input_data)
        mask_idx = kinds.index("mask") if "mask" in kinds else None
    tk = p.tensor_kwargs or {}
    sample_idx = 0
    for batch in loader:
        inputs_np, gt_np, base_elev, meta = build_batch_inputs(
            batch, p.model_name, p.input_data
        )
        n_real = gt_np.shape[0]
        lr_dem_np = np.asarray(batch["lr_dem"]) if meter_in is not None else None
        base_np = np.asarray(base_elev, np.float32)
        if mask_idx is not None:
            inputs_np = list(inputs_np)
            inputs_np[mask_idx] = pack_mask_np(inputs_np[mask_idx])
        if n_real < batch_cfg:
            inputs_np, _ = pad_batch_to(list(inputs_np), batch_cfg)
            gt_np, _ = pad_batch_to(gt_np, batch_cfg)
            base_np, _ = pad_batch_to(base_np, batch_cfg)
            if lr_dem_np is not None:
                lr_dem_np, _ = pad_batch_to(lr_dem_np, batch_cfg)
        if mesh is not None:
            inputs = shard_batch(mesh, [np.asarray(x) for x in inputs_np])
            gt = shard_batch(mesh, np.asarray(gt_np))
        else:
            inputs = [jnp.asarray(x) for x in inputs_np]
            gt = jnp.asarray(gt_np)
        if normalize is not None:
            base_dev = (shard_batch(mesh, base_np) if mesh is not None
                        else jnp.asarray(base_np))
            inputs, gt = normalize(inputs, gt, base_dev)
        pred, losses = eval_step(params, bn_state, inputs, gt)
        if losses:
            # per-sample totals: exact under padding AND under
            # batch-statistic losses (BerHu) — lazy device scalar, no sync
            per_sample = losses.get("_total_per_sample")
            if per_sample is not None:
                loss_meter.update(jnp.mean(per_sample[:n_real]), n_real)
            else:  # custom eval_step without per-sample support
                loss_meter.update(losses["Total"], n_real)
        meter.update(pred, gt, meta, base_elev, elev_log, n_valid=n_real)
        if meter_in is not None:
            lr_dem = (shard_batch(mesh, lr_dem_np) if mesh is not None
                      else jnp.asarray(lr_dem_np))
            if normalize is not None:
                # raw feed: apply ToArray's lr_dem scaling on device (same
                # scale-then-resize order as the host path)
                b = (base_dev[:, None, None, None] if p.get("relative")
                     else 0.0)
                lr_dem = scale_data(lr_dem.astype(jnp.float32), tk["min"],
                                    tk["max"], elev_log, base_elev=b)
            if lr_dem.shape[1:3] != gt.shape[1:3]:
                lr_dem = nn.bicubic_resize(lr_dem, gt.shape[1], gt.shape[2])
            meter_in.update(lr_dem, gt, meta, base_elev, elev_log,
                            n_valid=n_real)
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
                    if normalize is not None:
                        # raw feed: display expects normalized [0,1] panels
                        sample = _host_view_sample(sample, tk,
                                                   float(base_elev[i]))
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
