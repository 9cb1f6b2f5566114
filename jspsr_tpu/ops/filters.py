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


def ssim(pred, gt, data_range: float = 1.0, window_size: int = 11,
         sigma: float = 1.5, padding: str = "valid"):
    """SSIM over NHWC, gaussian window, mean over everything.

    padding='valid' matches piq.ssim(downsample=False); padding='same'
    matches the reference's local conv implementation.
    """
    win = gaussian_window(window_size, sigma)
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
    return jnp.mean(ssim_map)
