"""Losses and meters vs torch/numpy oracles."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from jspsr_tpu.losses import build_criterion, get_loss
from jspsr_tpu.metrics.meters import (
    MeterLE95,
    MeterMedian,
    MeterNMAD,
    MeterPSNR,
    MeterRMSE,
    MeterSlope,
    PerformanceMeter,
    torch_median,
)
from jspsr_tpu.data.normalize import descale_data, scale_data


def _rand(shape, seed, lo=0.0, hi=1.0):
    return np.random.default_rng(seed).uniform(lo, hi, shape).astype(np.float32)


def test_l1_l2_charbonnier_match_torch():
    p, g = _rand((2, 8, 8, 1), 0), _rand((2, 8, 8, 1), 1)
    tp, tg = torch.from_numpy(p), torch.from_numpy(g)
    np.testing.assert_allclose(
        float(get_loss("L1")(jnp.asarray(p), jnp.asarray(g))),
        float(torch.nn.functional.l1_loss(tp, tg)), rtol=1e-6)
    np.testing.assert_allclose(
        float(get_loss("L2")(jnp.asarray(p), jnp.asarray(g))),
        float(torch.nn.functional.mse_loss(tp, tg)), rtol=1e-6)
    ref_char = float(torch.mean(torch.sqrt((tp - tg) ** 2 + 1e-9)))
    np.testing.assert_allclose(
        float(get_loss("charbonnier")(jnp.asarray(p), jnp.asarray(g))),
        ref_char, rtol=1e-6)


def test_edge_loss_matches_manual_sobel():
    """kornia.spatial_gradient semantics: replicate pad, sobel/8."""
    p, g = _rand((1, 6, 6, 1), 2), _rand((1, 6, 6, 1), 3)

    def grad_np(x):
        x2 = np.pad(x[0, :, :, 0], 1, mode="edge")
        gx = np.zeros((6, 6)); gy = np.zeros((6, 6))
        kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]]) / 8.0
        ky = kx.T
        for i in range(6):
            for j in range(6):
                win = x2[i:i + 3, j:j + 3]
                gx[i, j] = (win * kx).sum()
                gy[i, j] = (win * ky).sum()
        return gx, gy

    pgx, pgy = grad_np(p)
    ggx, ggy = grad_np(g)
    ref = 0.5 * (np.abs(pgx - ggx).mean() + np.abs(pgy - ggy).mean())
    got = float(get_loss("Grad")(jnp.asarray(p), jnp.asarray(g)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-7)


def test_multiloss_total():
    p, g = _rand((2, 8, 8, 1), 4), _rand((2, 8, 8, 1), 5)
    crit = build_criterion({"L1": 1, "L2": 1, "Grad": 0.1})
    out = crit(jnp.asarray(p), jnp.asarray(g))
    assert set(out) == {"L1", "L2", "Grad", "Total"}
    np.testing.assert_allclose(
        float(out["Total"]),
        float(out["L1"]) + float(out["L2"]) + 0.1 * float(out["Grad"]),
        rtol=1e-6,
    )


def test_scale_descale_roundtrip():
    x = _rand((4, 4), 6, lo=10.0, hi=500.0)
    for log in (False, True):
        y = scale_data(x, -80, 929, elev_log=log)
        back = descale_data(y, -80, 929, elev_log=log)
        np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-3)


def test_meter_rmse_in_meters():
    """RMSE must descale to meters before computing (log-minmax)."""
    vmin, vmax = -80.0, 929.0
    gt_m = _rand((1, 16, 16, 1), 7, lo=0.0, hi=500.0)
    pred_m = gt_m + _rand((1, 16, 16, 1), 8, lo=-2.0, hi=2.0)
    gt_n = scale_data(gt_m, vmin, vmax, elev_log=True)
    pred_n = scale_data(pred_m, vmin, vmax, elev_log=True)
    meter = MeterRMSE(package="local", border=0.0, min=vmin, max=vmax)
    meter.update(jnp.asarray(pred_n), jnp.asarray(gt_n),
                 meta=[{"id": "a-b-c-d", "subset": "X"}], elev_log=True)
    ref = np.sqrt(np.mean((pred_m - gt_m) ** 2))
    np.testing.assert_allclose(meter.get_score(), ref, rtol=1e-3, atol=1e-3)


def test_border_crop_truncation_semantics():
    """int(h*border) per side, like metrics.py:173-184."""
    h = 30
    pred = np.zeros((1, h, h, 1), np.float32)
    gt = np.zeros((1, h, h, 1), np.float32)
    gt[0, 0, 0, 0] = 1.0  # inside the border -> must be cropped out
    m = MeterPSNR(package="piq", border=0.05)  # int(30*0.05)=1 px
    m.update(jnp.asarray(pred), jnp.asarray(gt))
    assert m.get_score() >= 99.0  # cropped -> identical -> max psnr


def test_median_matches_torch_lower_median():
    x = _rand((1, 4, 4, 1), 9)
    ref = float(torch.median(torch.from_numpy(x)))
    got = float(torch_median(jnp.asarray(x)))
    assert got == ref


def test_le95_matches_torch_kthvalue():
    vals = _rand((1, 10, 10, 1), 10, lo=-1, hi=1)
    zeros = np.zeros_like(vals)
    m = MeterLE95(package="local", border=0.0, min=0.0, max=1.0)
    m.update(jnp.asarray(np.clip(vals, 0, 1)), jnp.asarray(zeros))
    dh = torch.from_numpy(np.clip(vals, 0, 1) - zeros).abs().flatten()
    k = 1 + round(0.95 * (dh.numel() - 1))
    ref = float(torch.kthvalue(dh, k).values)
    np.testing.assert_allclose(m.get_score(), ref, rtol=1e-5)


def test_nmad_matches_torch():
    p = _rand((1, 8, 8, 1), 11)
    g = _rand((1, 8, 8, 1), 12)
    m = MeterNMAD(package="local", border=0.0, min=0.0, max=1.0)
    m.update(jnp.asarray(p), jnp.asarray(g))
    tp, tg = torch.from_numpy(np.clip(p, 0, 1)), torch.from_numpy(g)
    dh = tp - tg
    ref = float(1.4826 * torch.median(torch.abs(dh - torch.median(dh))))
    np.testing.assert_allclose(m.get_score(), ref, rtol=1e-5)


def test_slope_local_matches_reference_sobel():
    p = _rand((1, 10, 10, 1), 13)
    g = _rand((1, 10, 10, 1), 14)
    m = MeterSlope(package="local", border=0.0, min=0.0, max=1.0)
    m.update(jnp.asarray(p), jnp.asarray(g))

    def sobel_mag_t(x):
        gx = torch.tensor([[[[2., 0., -2.], [4., 0., -4.], [2., 0., -2.]]]])
        gy = torch.tensor([[[[2., 4., 2.], [0., 0., 0.], [-2., -4., -2.]]]])
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        vx = torch.nn.functional.conv2d(t, gx)
        vy = torch.nn.functional.conv2d(t, gy)
        return torch.sqrt(vx * vx + vy * vy)

    ps, gs = sobel_mag_t(np.clip(p, 0, 1)), sobel_mag_t(g)
    ref = float(torch.sqrt(torch.mean((ps - gs) ** 2)))
    np.testing.assert_allclose(m.get_score(), ref, rtol=1e-4)


def test_performance_meter_bundle():
    cfg = {"PSNR": {"package": "piq", "border": 0.05, "min": -80, "max": 929},
           "RMSE": {"package": "local", "border": 0.05, "min": -80, "max": 929}}
    pm = PerformanceMeter(cfg)
    p, g = _rand((1, 20, 20, 1), 15), _rand((1, 20, 20, 1), 16)
    pm.update(jnp.asarray(p), jnp.asarray(g), meta=[{"id": "a-b-c-d", "subset": "S"}],
              elev_log=True)
    scores = pm.get_score()
    assert set(scores) == {"PSNR", "RMSE"}
    assert all(np.isfinite(v) for v in scores.values())


def test_seg_losses_match_torch():
    from jspsr_tpu.losses.functions import balanced_bce_loss, softmax_ce_loss

    rng = np.random.default_rng(20)
    # softmax CE with ignore label
    logits = rng.normal(size=(2, 8, 8, 5)).astype(np.float32)
    label = rng.integers(0, 5, (2, 8, 8, 1)).astype(np.int64)
    label[0, 0, 0, 0] = 255  # ignored
    ref = torch.nn.functional.nll_loss(
        torch.log_softmax(torch.from_numpy(logits.transpose(0, 3, 1, 2)), 1),
        torch.from_numpy(label[:, :, :, 0]), ignore_index=255)
    got = softmax_ce_loss(jnp.asarray(logits), jnp.asarray(label))
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)

    # balanced BCE vs a direct numpy transliteration of the reference math
    out = rng.normal(size=(1, 6, 6, 1)).astype(np.float32)
    lab = (rng.uniform(size=(1, 6, 6, 1)) > 0.7).astype(np.float32)
    labels = (lab >= 0.5).astype(np.float32)
    w = (1 - labels).sum() / labels.size
    gt0 = (out >= 0).astype(np.float32)
    lv = out * (labels - gt0) - np.log1p(np.exp(out - 2 * out * gt0))
    ref2 = (w * (-(labels * lv).sum()) + (1 - w) * (-((1 - labels) * lv).sum())) / lab.size
    got2 = balanced_bce_loss(jnp.asarray(out), jnp.asarray(lab))
    np.testing.assert_allclose(float(got2), ref2, rtol=1e-5)


def test_to_image_to_dem_helpers():
    from jspsr_tpu.data.transforms import ToDEM, ToImage

    x = np.linspace(0, 1, 16, dtype=np.float32).reshape(4, 4)
    img = ToImage()(x)
    assert img.max() == 255 and img.min() == 0
    dem = ToDEM(-80, 929, elev_log=True)(x)
    np.testing.assert_allclose(dem[0, 0], -80 + 1, atol=1e-3)  # exp(0)+min


def test_ssim_invariants():
    from jspsr_tpu.ops.filters import ssim
    from jspsr_tpu.metrics.meters import MeterSSIM

    rng = np.random.default_rng(30)
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32))
    # identical images -> 1
    np.testing.assert_allclose(float(ssim(x, x)), 1.0, atol=1e-5)
    # symmetric
    y = jnp.clip(x + 0.1 * jnp.asarray(
        rng.normal(size=x.shape).astype(np.float32)), 0, 1)
    np.testing.assert_allclose(float(ssim(x, y)), float(ssim(y, x)), rtol=1e-5)
    # more noise -> lower ssim
    z = jnp.clip(x + 0.4 * jnp.asarray(
        rng.normal(size=x.shape).astype(np.float32)), 0, 1)
    assert float(ssim(x, z)) < float(ssim(x, y)) < 1.0
    # meter wiring (piq-style valid padding and local same padding)
    for package in ("piq", "local"):
        m = MeterSSIM(package=package, border=0.0, min=0, max=1)
        m.update(x, x)
        np.testing.assert_allclose(m.get_score(), 1.0, atol=1e-5)
