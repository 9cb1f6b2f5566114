"""Evaluation meters (reference evaluation/metrics.py), on-device jnp.

Semantics preserved exactly:
- fractional border crop with int truncation: int(h*border) pixels per side
  (metrics.py:173-184);
- prediction clamped to [0, 1], gt NOT clamped (metrics.py:193-197);
- elevation meters (RMSE/Median/NMAD/LE95/Slope) descale both tensors to
  METERS (log-minmax aware) before computing (metrics.py:372-373 etc.);
- Median is torch's lower-median; LE95 uses k = 1 + round(0.95*(n-1))
  (1-based kth smallest of |dh|);
- PSNR 'piq' convention: -10*log10(mse) on the normalized [0,1] tensors
  (greyscale conversion is the identity for 1-channel DEMs);
- Slope 'local': 2x-scaled sobel magnitude, valid padding (metrics.py:116-139).

Each meter jit-compiles one small reduction; shapes are constant per split so
compilation is amortized. Meters accumulate python floats across update().
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from jspsr_tpu.data.normalize import descale_data
from jspsr_tpu.ops.filters import sobel_magnitude, ssim as ssim_fn


def crop_border(x, border: float):
    if not border:
        return x
    h, w = x.shape[1:3]
    bh, bw = int(h * border), int(w * border)
    return x[:, bh: h - bh, bw: w - bw, :]


def _prepare(pred, gt, border: float, tensor_range: str = "[0, 1]"):
    pred = crop_border(pred, border)
    gt = crop_border(gt, border)
    if tensor_range == "[-1, 1]":
        pred, gt = (pred + 1) / 2.0, (gt + 1) / 2.0
    elif tensor_range == "[0, 255]":
        pred, gt = pred / 255.0, gt / 255.0
    pred = jnp.clip(pred, 0.0, 1.0)
    return pred, gt


def torch_median(x):
    """torch.median: lower middle element of the sorted flattened array."""
    flat = jnp.sort(x.reshape(-1))
    return flat[(flat.size - 1) // 2]


class MeterBase:
    name = "base"

    def __init__(self, package: str = "local", tensor_range: str = "[0, 1]",
                 border: float = 0.0, min: float = 0.0, max: float = 1.0,
                 verbose: bool = False, **_):
        self.package = package
        self.tensor_range = tensor_range
        self.border = border
        self.value_min = min
        self.value_max = max
        self.verbose = verbose
        self.total = 0.0
        self.total_n = 0

    def reset(self):
        self.total = 0.0
        self.total_n = 0

    def update(self, pred, gt, meta=None, base_elev=0, elev_log=False):
        # accumulate lazily on device: a float() here would synchronize the
        # dispatch pipeline per sample (~150 ms RTT through a TPU tunnel);
        # one transfer happens in get_score() instead.
        v = self._compute(pred, gt, elev_log)
        self.total = self.total + v
        self.total_n += 1

    def get_score(self):
        score = float(self.total) / max(self.total_n, 1)
        if self.verbose:
            print(f"{self.package[:3]} {self.name} {1 - self.border}\t{score:5.4f}")
        return score

    # subclasses implement _compute(pred, gt, elev_log) -> scalar
    def _descale(self, pred, gt, elev_log):
        pred, gt = _prepare(pred, gt, self.border, self.tensor_range)
        pred = descale_data(pred, self.value_min, self.value_max, elev_log)
        gt = descale_data(gt, self.value_min, self.value_max, elev_log)
        return pred, gt


class MeterPSNR(MeterBase):
    name = "PSNR"

    @partial(jax.jit, static_argnums=(0, 3))
    def _compute(self, pred, gt, elev_log):
        pred, gt = _prepare(pred, gt, self.border, self.tensor_range)
        mse = jnp.mean(jnp.square(gt - pred))
        return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))


class MeterSSIM(MeterBase):
    name = "SSIM"

    @partial(jax.jit, static_argnums=(0, 3))
    def _compute(self, pred, gt, elev_log):
        pred, gt = _prepare(pred, gt, self.border, self.tensor_range)
        pad = "same" if self.package == "local" else "valid"
        return ssim_fn(pred, gt, data_range=1.0, padding=pad)


class MeterRMSE(MeterBase):
    """Elevation RMSE in meters; tracks the worst-3 samples by id."""

    name = "RMSE"

    def __init__(self, **kw):
        super().__init__(**kw)
        self.sample_rmse = []
        self.sample_id = []

    def reset(self):
        super().reset()
        self.sample_rmse = []
        self.sample_id = []

    @partial(jax.jit, static_argnums=(0, 3))
    def _compute(self, pred, gt, elev_log):
        pred, gt = self._descale(pred, gt, elev_log)
        return jnp.sqrt(jnp.mean(jnp.square(pred - gt)))

    def update(self, pred, gt, meta=None, base_elev=0, elev_log=False):
        v = self._compute(pred, gt, elev_log)  # device scalar, lazy
        self.total = self.total + v
        self.total_n += 1
        self.sample_rmse.append(v)
        self.sample_id.append(_short_id(meta))

    def get_score(self):
        score = float(self.total) / max(self.total_n, 1)
        if self.verbose and self.total_n > 3:
            values = [float(v) for v in jax.device_get(self.sample_rmse)]
            worst = sorted(zip(values, self.sample_id), reverse=True)[:3]
            worst_s = ", ".join(f"{i} {v:.2f}" for v, i in worst)
            print(f"{self.package[:3]} {self.name} {1 - self.border}\t"
                  f"{score:5.4f}, {worst_s}")
        return score


class MeterMedian(MeterBase):
    name = "Median"

    @partial(jax.jit, static_argnums=(0, 3))
    def _compute(self, pred, gt, elev_log):
        pred, gt = self._descale(pred, gt, elev_log)
        return torch_median(pred - gt)


class MeterNMAD(MeterBase):
    name = "NMAD"

    @partial(jax.jit, static_argnums=(0, 3))
    def _compute(self, pred, gt, elev_log):
        pred, gt = self._descale(pred, gt, elev_log)
        dh = pred - gt
        mdh = torch_median(dh)
        return 1.4826 * torch_median(jnp.abs(dh - mdh))


class MeterLE95(MeterBase):
    name = "LE95"

    @partial(jax.jit, static_argnums=(0, 3))
    def _compute(self, pred, gt, elev_log):
        pred, gt = self._descale(pred, gt, elev_log)
        dh = jnp.abs(pred - gt).reshape(-1)
        k = 1 + round(0.95 * (dh.size - 1))  # 1-based kth smallest
        return jnp.sort(dh)[k - 1]


class MeterSlope(MeterBase):
    name = "Slop"

    @partial(jax.jit, static_argnums=(0, 3))
    def _compute(self, pred, gt, elev_log):
        pred, gt = self._descale(pred, gt, elev_log)
        ps = sobel_magnitude(pred)
        gs = sobel_magnitude(gt)
        return jnp.sqrt(jnp.mean(jnp.square(ps - gs)))


def _short_id(meta):
    """Worst-sample id string (reference metrics.py:363-367); bs=1 eval."""
    if not meta:
        return "?"
    m = meta[0] if isinstance(meta, (list, tuple)) else meta
    subset = str(m.get("subset", "?")).split("_")[0]
    subset = subset if len(subset) < 6 else subset[:7]
    parts = str(m.get("id", "?")).split("-")
    sid = "-".join(parts[2:4]) if len(parts) >= 4 else m.get("id", "?")
    return f"{subset}_{sid}"


_METERS = {
    "psnr": MeterPSNR,
    "ssim": MeterSSIM,
    "rmse": MeterRMSE,
    "median": MeterMedian,
    "nmad": MeterNMAD,
    "le95": MeterLE95,
    "slope": MeterSlope,
}


def get_meter(name: str, **kwargs):
    key = name.lower()
    if key not in _METERS:
        raise NotImplementedError(f"Undefined metric: {name}")
    return _METERS[key](**kwargs)


class PerformanceMeter:
    """Bundle of meters built from config (reference evaluate_utils.py:26-118)."""

    def __init__(self, metric_cfg: dict):
        self.meters = {name: get_meter(name, **(kw or {}))
                       for name, kw in metric_cfg.items()}

    def reset(self):
        for m in self.meters.values():
            m.reset()

    def update(self, pred, gt, meta=None, base_elev=0, elev_log=False):
        for m in self.meters.values():
            m.update(pred, gt, meta, base_elev, elev_log)

    def get_score(self, verbose: bool = False):
        return {name: m.get_score() for name, m in self.meters.items()}
