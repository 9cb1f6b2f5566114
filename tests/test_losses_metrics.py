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


# ---------------------------------------------------------------------------
# Round 2: golden pins for every metric `package:` the reference accepts
# (VERDICT items 5 & 6). Oracles are handwritten torch/numpy implementations
# of the library conventions (piq/skimage/kornia/richdem are not installed).
# ---------------------------------------------------------------------------

from jspsr_tpu.metrics.meters import MeterSSIM, _sample_ids, _short_id


def _meter_value(meter, p, g, elev_log=False):
    meter.reset()
    meter.update(jnp.asarray(p), jnp.asarray(g), elev_log=elev_log)
    return meter.get_score()


def test_ssim_local_matches_reference_torch_impl():
    """package='local' reproduces the reference's torch SSIM bit-for-bit,
    INCLUDING its buggy exponential 'gaussian' window
    (reference metrics.py:20-27,39-63)."""
    import math
    import torch.nn.functional as F

    def ref_gaussian(window_size, sigma):
        g = torch.Tensor([
            math.exp(-(x - window_size // 2) * 2 / float(2 * sigma * 2))
            for x in range(window_size)
        ])
        return g / g.sum()

    def ref_ssim(img1, img2, window_size=11):
        channel = img1.size(1)
        _1d = ref_gaussian(window_size, 1.5).unsqueeze(1)
        win = (_1d.mm(_1d.t()).float().unsqueeze(0).unsqueeze(0)
               .expand(channel, 1, window_size, window_size).contiguous())
        pad = window_size // 2
        mu1 = F.conv2d(img1, win, padding=pad, groups=channel)
        mu2 = F.conv2d(img2, win, padding=pad, groups=channel)
        mu1_sq, mu2_sq, mu12 = mu1 ** 2, mu2 ** 2, mu1 * mu2
        s1 = F.conv2d(img1 * img1, win, padding=pad, groups=channel) - mu1_sq
        s2 = F.conv2d(img2 * img2, win, padding=pad, groups=channel) - mu2_sq
        s12 = F.conv2d(img1 * img2, win, padding=pad, groups=channel) - mu12
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        return float((((2 * mu12 + c1) * (2 * s12 + c2)) /
                      ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))).mean())

    p, g = _rand((1, 24, 24, 1), 10), _rand((1, 24, 24, 1), 11)
    # reference order: ssim(_gt, _pred) with pred clamped
    want = ref_ssim(torch.from_numpy(g).permute(0, 3, 1, 2),
                    torch.from_numpy(p).permute(0, 3, 1, 2))
    got = _meter_value(MeterSSIM(package="local"), p, g)
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_ssim_piq_convention_golden():
    """package='piq' == piq.ssim(downsample=False): TRUE gaussian 11x11
    sigma 1.5, VALID window, mean over the map. Oracle: independent numpy
    implementation (piq itself is not installed; the reference passes
    downsample=False explicitly at metrics.py:300-302, so no pre-filter)."""
    p, g = _rand((1, 20, 20, 1), 12), _rand((1, 20, 20, 1), 13)

    gauss = np.exp(-((np.arange(11) - 5) ** 2) / (2 * 1.5 ** 2))
    gauss /= gauss.sum()
    win = np.outer(gauss, gauss)

    def f(x):  # valid 2D correlation
        h, w = x.shape
        out = np.zeros((h - 10, w - 10))
        for i in range(h - 10):
            for j in range(w - 10):
                out[i, j] = (x[i:i + 11, j:j + 11] * win).sum()
        return out

    a, b = g[0, :, :, 0].astype(np.float64), p[0, :, :, 0].astype(np.float64)
    mu1, mu2 = f(a), f(b)
    s1 = f(a * a) - mu1 ** 2
    s2 = f(b * b) - mu2 ** 2
    s12 = f(a * b) - mu1 * mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    want = (((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) /
            ((mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))).mean()

    got = _meter_value(MeterSSIM(package="piq"), p, g)
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_ssim_skimage_rows_golden():
    """package='skimage' reproduces the reference's degenerate
    structural_similarity(channel_axis=0) call on (H, W) arrays: per-row 1-D
    SSIM with a 7-tap uniform filter, sample covariance, 3-px crop
    (reference metrics.py:303-313). Oracle: handwritten numpy skimage
    algorithm."""
    p, g = _rand((1, 10, 32, 1), 14), _rand((1, 10, 32, 1), 15)

    def uf1d(x):  # scipy uniform_filter(size=7, mode='reflect') on 1-D
        xp = np.pad(x, 3, mode="symmetric")
        return np.convolve(xp, np.ones(7) / 7.0, mode="valid")

    def ssim_1d(a, b):  # skimage structural_similarity, 1-D, win 7
        ux, uy = uf1d(a), uf1d(b)
        cov_norm = 7.0 / 6.0
        vx = cov_norm * (uf1d(a * a) - ux ** 2)
        vy = cov_norm * (uf1d(b * b) - uy ** 2)
        vxy = cov_norm * (uf1d(a * b) - ux * uy)
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        s = (((2 * ux * uy + c1) * (2 * vxy + c2)) /
             ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2)))
        return s[3:-3].mean()

    rows = [ssim_1d(g[0, r, :, 0].astype(np.float64),
                    p[0, r, :, 0].astype(np.float64))
            for r in range(10)]
    want = np.mean(rows)

    got = _meter_value(MeterSSIM(package="skimage"), p, g)
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_psnr_package_conventions():
    p, g = _rand((1, 16, 16, 1), 16), _rand((1, 16, 16, 1), 17)
    mse = float(np.mean((g.astype(np.float64) - p.astype(np.float64)) ** 2))
    wanted = 10 * np.log10(1.0 / mse)
    for pkg in ("piq", "skimage", "local"):
        got = _meter_value(MeterPSNR(package=pkg), p, g)
        np.testing.assert_allclose(got, wanted, rtol=1e-5, err_msg=pkg)
    # local: mse == 0 -> 100 (reference metrics.py:110-111)
    got = _meter_value(MeterPSNR(package="local"), p, p)
    assert got == 100.0


def test_psnr_y_channel_piq():
    """psnr_type='y' with piq: BT.601 luma [0.299, 0.587, 0.114] on
    3-channel inputs (reference metrics.py:228-235 via piq's
    convert_to_greyscale)."""
    p, g = _rand((1, 12, 12, 3), 18), _rand((1, 12, 12, 3), 19)
    w = np.array([0.299, 0.587, 0.114])
    yp = (p.astype(np.float64) * w).sum(-1)
    yg = (g.astype(np.float64) * w).sum(-1)
    want = -10 * np.log10(np.mean((yg - yp) ** 2))
    got = _meter_value(MeterPSNR(package="piq", psnr_type="y"), p, g)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # 1-channel input: greyscale conversion is the identity (piq checks C==3)
    p1, g1 = p[..., :1], g[..., :1]
    got_y = _meter_value(MeterPSNR(package="piq", psnr_type="y"), p1, g1)
    got_rgb = _meter_value(MeterPSNR(package="piq"), p1, g1)
    np.testing.assert_allclose(got_y, got_rgb, rtol=1e-7)


def test_psnr_y_channel_matlab_luma():
    """skimage/local psnr_type='y': Matlab BT.601 luma rescaled to [0,1]
    (the reference's own code path crashes — documented deviation)."""
    p, g = _rand((1, 12, 12, 3), 20), _rand((1, 12, 12, 3), 21)
    w = np.array([65.481, 128.553, 24.966])
    yp = ((p.astype(np.float64) * w).sum(-1) + 16.0) / 255.0
    yg = ((g.astype(np.float64) * w).sum(-1) + 16.0) / 255.0
    want = 10 * np.log10(1.0 / np.mean((yg - yp) ** 2))
    for pkg in ("skimage", "local"):
        got = _meter_value(MeterPSNR(package=pkg, psnr_type="y"), p, g)
        np.testing.assert_allclose(got, want, rtol=1e-5, err_msg=pkg)


def test_slope_kornia_package():
    """package='kornia': RMSE over the stacked spatial_gradient field
    (reference metrics.py:662-665). Oracle: torch conv with kornia's
    normalized sobel + replicate pad."""
    import torch.nn.functional as F

    p, g = _rand((1, 12, 12, 1), 22), _rand((1, 12, 12, 1), 23)

    def grads(x):
        t = torch.from_numpy(x).permute(0, 3, 1, 2)
        t = F.pad(t, (1, 1, 1, 1), mode="replicate")
        kx = torch.tensor([[-1., 0., 1.], [-2., 0., 2.], [-1., 0., 1.]]) / 8.0
        ky = kx.t()
        wk = torch.stack([kx, ky]).unsqueeze(1)
        return F.conv2d(t, wk)  # (1, 2, H, W)

    d = grads(p) - grads(g)
    want = float(torch.sqrt(torch.mean(d ** 2)))
    got = _meter_value(
        MeterSlope(package="kornia", min=0.0, max=1.0), p, g)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_slope_richdem_horn_golden():
    """package='richdem': Horn slope_riserun with the reference's
    shape-derived cell sizes (metrics.py:620-636: cell_x=H, cell_y=W) and
    focal-value border convention. Oracle: scalar-loop numpy Horn."""
    p, g = _rand((1, 9, 11, 1), 24), _rand((1, 9, 11, 1), 25)
    h, w = 9, 11

    def horn_np(x):
        out = np.zeros((h, w))
        for r in range(h):
            for c in range(w):
                def nb(dy, dx):
                    rr, cc = r + dy, c + dx
                    if 0 <= rr < h and 0 <= cc < w:
                        return x[rr, cc]
                    return x[r, c]
                a, b_, c_ = nb(-1, -1), nb(-1, 0), nb(-1, 1)
                d, f = nb(0, -1), nb(0, 1)
                gg, hh, ii = nb(1, -1), nb(1, 0), nb(1, 1)
                dzdx = ((c_ + 2 * f + ii) - (a + 2 * d + gg)) / (8.0 * h)
                dzdy = ((gg + 2 * hh + ii) - (a + 2 * b_ + c_)) / (8.0 * w)
                out[r, c] = np.sqrt(dzdx ** 2 + dzdy ** 2)
        return out

    sp = horn_np(p[0, :, :, 0].astype(np.float64))
    sg = horn_np(g[0, :, :, 0].astype(np.float64))
    want = np.sqrt(np.mean((sp - sg) ** 2))
    got = _meter_value(
        MeterSlope(package="richdem", min=0.0, max=1.0), p, g)
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("meter_fn", [
    lambda: MeterPSNR(package="piq", border=0.05),
    lambda: MeterSSIM(package="piq", border=0.05),
    lambda: MeterSSIM(package="local"),
    lambda: MeterSSIM(package="skimage"),
    lambda: MeterRMSE(package="local", min=-80, max=929, border=0.05),
    lambda: MeterMedian(package="local", min=-80, max=929),
    lambda: MeterNMAD(package="local", min=-80, max=929),
    lambda: MeterLE95(package="local", min=-80, max=929),
    lambda: MeterSlope(package="local", min=-80, max=929),
    lambda: MeterSlope(package="richdem", min=-80, max=929),
])
def test_batched_update_equals_per_sample_updates(meter_fn):
    """Batched eval == bs=1 eval for every meter: one update with a batch of
    4 produces exactly the same average as 4 single-sample updates
    (the VERDICT #9 fast-path correctness contract)."""
    preds = _rand((4, 20, 20, 1), 30)
    gts = _rand((4, 20, 20, 1), 31)

    m1 = meter_fn()
    for i in range(4):
        m1.update(jnp.asarray(preds[i:i + 1]), jnp.asarray(gts[i:i + 1]),
                  elev_log=True)
    one_by_one = m1.get_score()

    m2 = meter_fn()
    m2.update(jnp.asarray(preds), jnp.asarray(gts), elev_log=True)
    batched = m2.get_score()

    np.testing.assert_allclose(batched, one_by_one, rtol=1e-5)


def test_worst_sample_id_parsing():
    """Reference a-b-c-d ids are shortened; foreign formats fall back to the
    raw id; batched meta lists yield one id per sample."""
    ref = {"subset": "Angers_x", "id": "44-2013-0393-6720"}
    assert _short_id(ref) == "Angers_0393-6720"
    foreign = {"subset": "CityName", "id": "tile_007"}
    assert _short_id(foreign) == "CityNam_tile_007"  # raw id kept verbatim
    metas = [ref, foreign]
    ids = _sample_ids(metas, 2)
    assert len(ids) == 2 and ids[0].endswith("0393-6720")
    # bs=1 single-dict meta still works
    assert _sample_ids(ref, 1) == [_short_id(ref)]
