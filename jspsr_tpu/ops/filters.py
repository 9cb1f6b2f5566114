"""Fixed-kernel depthwise image filters (sobel gradients, gaussian SSIM
windows) as jnp convs — the TPU replacements for kornia/piq/richdem native
dependencies (reference losses/loss_functions.py:171-185,
evaluation/metrics.py:116-139,595-691).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax

_DIMS = ("NHWC", "HWIO", "NHWC")


def _depthwise(x, kernel_hw, padding):
    """Apply one 2D kernel depthwise over NHWC channels."""
    c = x.shape[-1]
    k = jnp.asarray(kernel_hw, x.dtype)
    w = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # HWIO with groups=C
    return lax.conv_general_dilated(
        x, w, (1, 1), padding, dimension_numbers=_DIMS, feature_group_count=c
    )


def spatial_gradient(x):
    """kornia-style normalized sobel gradient: NHWC -> (gx, gy), each NHWC.

    Replicate-padded, kernels normalized by sum(|k|)=8
    (kornia.filters.spatial_gradient(mode='sobel', order=1, normalized=True)).
    """
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    gx_k = [[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]]
    gy_k = [[-1, -2, -1], [0, 0, 0], [1, 2, 1]]
    gx = _depthwise(xp, [[v / 8.0 for v in r] for r in gx_k], ((0, 0), (0, 0)))
    gy = _depthwise(xp, [[v / 8.0 for v in r] for r in gy_k], ((0, 0), (0, 0)))
    return gx, gy


def sobel_magnitude(x):
    """The reference's 'local' slope operator (metrics.py:116-139): 2x-scaled
    sobel, VALID padding (output shrinks by 2), magnitude sqrt(gx^2+gy^2)."""
    gx_k = [[2.0, 0.0, -2.0], [4.0, 0.0, -4.0], [2.0, 0.0, -2.0]]
    gy_k = [[2.0, 4.0, 2.0], [0.0, 0.0, 0.0], [-2.0, -4.0, -2.0]]
    gx = _depthwise(x, gx_k, ((0, 0), (0, 0)))
    gy = _depthwise(x, gy_k, ((0, 0), (0, 0)))
    return jnp.sqrt(gx * gx + gy * gy)


def gaussian_window(size: int = 11, sigma: float = 1.5):
    g = jnp.asarray(
        [math.exp(-((i - size // 2) ** 2) / (2 * sigma**2)) for i in range(size)]
    )
    g = g / g.sum()
    return g[:, None] @ g[None, :]


def reference_exp_window(size: int = 11, sigma: float = 1.5):
    """The reference's 'gaussian' SSIM window — faithfully including its bug
    (evaluation/metrics.py:20-27 computes ``exp(-(x - size//2) * 2 /
    (2*sigma*2))``: linear, not squared, so the window is a one-sided
    decaying exponential, not a gaussian). Reproduced so MeterSSIM
    package='local' matches the reference's local implementation bit-for-bit.
    """
    g = jnp.asarray(
        [math.exp(-(i - size // 2) * 2 / float(2 * sigma * 2))
         for i in range(size)]
    )
    g = g / g.sum()
    return g[:, None] @ g[None, :]


def ssim(pred, gt, data_range: float = 1.0, window_size: int = 11,
         sigma: float = 1.5, padding: str = "valid", window=None,
         per_sample: bool = False):
    """SSIM over NHWC with a 2D conv window.

    padding='valid' + gaussian window matches the reference's piq call,
    ``piq.ssim(gt, pred, data_range=1.0, downsample=False)``
    (evaluation/metrics.py:299-302 — note the reference passes
    downsample=False explicitly, so no pre-filtering/downsampling happens and
    valid-window gaussian SSIM is the exact convention; golden-pinned in
    tests/test_losses_metrics.py).

    padding='same' + window=reference_exp_window() matches the reference's
    'local' torch implementation (zero-padded F.conv2d, metrics.py:39-63).

    per_sample=True returns a (B,) vector (mean over H, W, C per sample)
    instead of the scalar mean — the batched-eval path; identical to bs=1
    averaging by linearity.
    """
    win = gaussian_window(window_size, sigma) if window is None else window
    pad = (
        ((window_size // 2, window_size // 2),) * 2 if padding == "same"
        else ((0, 0), (0, 0))
    )

    def f(v):
        return _depthwise(v, win, pad)

    mu1, mu2 = f(pred), f(gt)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = f(pred * pred) - mu1_sq
    s2 = f(gt * gt) - mu2_sq
    s12 = f(pred * gt) - mu12
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    )
    if per_sample:
        return jnp.mean(ssim_map, axis=(1, 2, 3))
    return jnp.mean(ssim_map)


def _uniform_filter_w(x, size: int = 7):
    """scipy.ndimage.uniform_filter along the W axis of NHWC, mode='reflect'
    (scipy 'reflect' == numpy pad 'symmetric': edge value IS repeated)."""
    half = size // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (half, half), (0, 0)), mode="symmetric")
    k = jnp.full((1, size), 1.0 / size, x.dtype)
    return _depthwise(xp, k, ((0, 0), (0, 0)))


def ssim_skimage_rows(pred, gt, data_range: float = 1.0, win_size: int = 7,
                      per_sample: bool = False):
    """skimage SSIM exactly as the reference invokes it
    (evaluation/metrics.py:303-313): per channel it calls
    ``structural_similarity(gt[:, i].squeeze(), pred[:, i].squeeze(),
    channel_axis=0)`` on an (H, W) array — channel_axis=0 makes skimage treat
    every ROW as a channel, i.e. it computes 1-D SSIM along W per row
    (uniform 7-tap filter, sample covariance N/(N-1), borders cropped by
    (win-1)//2) and averages. Degenerate, but it is the reference's observable
    behavior, reproduced here; golden-tested against a handwritten numpy
    oracle of skimage's algorithm.
    """
    cov_norm = win_size / (win_size - 1.0)  # sample covariance (skimage)
    uf = lambda v: _uniform_filter_w(v, win_size)
    ux, uy = uf(pred), uf(gt)
    uxx, uyy, uxy = uf(pred * pred), uf(gt * gt), uf(pred * gt)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux * ux + uy * uy + c1) * (vx + vy + c2)
    )
    half = (win_size - 1) // 2
    s = s[:, :, half: s.shape[2] - half, :]  # crop the 1-D filter border
    if per_sample:
        return jnp.mean(s, axis=(1, 2, 3))
    return jnp.mean(s)


def horn_slope(dem, cell_x: float, cell_y: float):
    """Horn (1981) slope_riserun — the TPU-native equivalent of richdem's
    ``TerrainAttribute(attrib='slope_riserun')`` (reference
    evaluation/metrics.py:638-660). NHWC in/out.

    dz/dx = ((c + 2f + i) - (a + 2d + g)) / (8 * cell_x)
    dz/dy = ((g + 2h + i) - (a + 2b + c)) / (8 * cell_y)
    slope  = sqrt((dz/dx)^2 + (dz/dy)^2)

    Out-of-grid neighbors take the focal cell's value (richdem's
    nodata/border convention). The reference itself documents that its three
    slope methods disagree numerically (metrics.py:593-594); richdem is not
    installable here, so parity is to the published Horn formulation, not
    bit-level richdem output.
    """
    b, h, w, c = dem.shape
    rows = jnp.arange(h)
    cols = jnp.arange(w)

    def nb(dy, dx):
        # nb[r, c] = dem[r+dy, c+dx], focal value when out of grid
        v = jnp.roll(dem, shift=(-dy, -dx), axis=(1, 2))
        ok_r = (rows + dy >= 0) & (rows + dy < h)
        ok_c = (cols + dx >= 0) & (cols + dx < w)
        m = (ok_r[:, None] & ok_c[None, :])[None, :, :, None]
        return jnp.where(m, v, dem)

    a, b_, c_ = nb(-1, -1), nb(-1, 0), nb(-1, 1)
    d, f = nb(0, -1), nb(0, 1)
    g, h_, i = nb(1, -1), nb(1, 0), nb(1, 1)
    dzdx = ((c_ + 2 * f + i) - (a + 2 * d + g)) / (8.0 * cell_x)
    dzdy = ((g + 2 * h_ + i) - (a + 2 * b_ + c_)) / (8.0 * cell_y)
    return jnp.sqrt(dzdx * dzdx + dzdy * dzdy)
