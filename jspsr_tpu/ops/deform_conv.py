"""Modulated deformable convolution (DCNv2) — pure-XLA TPU-friendly formulation.

This is THE spatial-propagation refinement primitive of the framework: the
reference's only native-CUDA dependency (`torchvision.ops.deform_conv2d`,
used at reference spn.py:105-114, LRRU.py:284-293, nlspn.py:130-139).

TPU-first design: instead of a scalar per-pixel gather loop (the CUDA
pattern), we build the *deformable im2col* tensor with 4 vectorized corner
gathers (XLA `gather`, VPU/HBM bound) and contract it against the kernel with
a single matmul (MXU bound). Backward comes from JAX autodiff: gathers
transpose to scatter-adds, and gradients flow to input, offsets (through the
bilinear weights), mask, weight and bias — matching the CUDA kernel's VJP.

Semantics match torchvision.ops.deform_conv2d (verified against a handwritten
numpy golden model in tests/test_deform_conv.py):

- ``offset`` channels are tap-major interleaved ``(dy, dx)`` pairs in
  row-major kernel order: channel ``2k`` is the y-offset of tap ``k``.
- ``mask`` multiplies each tap's bilinear sample (modulated / DCNv2).
- Bilinear sampling is zero outside the image: a sample at position p
  contributes only its in-bounds corners.

Layouts are NHWC / HWIO (TPU-native), not torch's NCHW / OIHW.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def deform_im2col(
    x: jax.Array,
    offset: jax.Array,
    mask: jax.Array | None,
    kernel_size,
    stride=1,
    padding=1,
    dilation=1,
) -> jax.Array:
    """Deformable im2col: returns columns of shape (B, Ho, Wo, K, Cin).

    x: (B, H, W, Cin); offset: (B, Ho, Wo, 2K); mask: (B, Ho, Wo, K) or None.
    """
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    b, h, w, cin = x.shape
    _, ho, wo, ck = offset.shape
    k = kh * kw
    assert ck == 2 * k, f"offset channels {ck} != 2*K={2 * k}"

    # Sampling positions: p = out_pos*stride - pad + tap*dilation + offset.
    oy = jnp.arange(ho, dtype=x.dtype) * sh - ph  # (Ho,)
    ox = jnp.arange(wo, dtype=x.dtype) * sw - pw  # (Wo,)
    ky = jnp.arange(kh, dtype=x.dtype) * dh  # (kh,)
    kx = jnp.arange(kw, dtype=x.dtype) * dw  # (kw,)
    tap_y = jnp.repeat(ky, kw)  # (K,) row-major taps
    tap_x = jnp.tile(kx, kh)  # (K,)

    off = offset.reshape(b, ho, wo, k, 2)
    py = oy[None, :, None, None] + tap_y[None, None, None, :] + off[..., 0]
    px = ox[None, None, :, None] + tap_x[None, None, None, :] + off[..., 1]
    # py/px: (B, Ho, Wo, K)

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    ty = py - y0
    tx = px - x0

    def corner(yc, xc):
        """Gather x at integer corner (yc, xc) with zero padding outside."""
        valid = (yc >= 0) & (yc <= h - 1) & (xc >= 0) & (xc <= w - 1)
        yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        flat = yi * w + xi  # (B, Ho, Wo, K)

        def gather_b(xb, idx):
            return jnp.take(xb.reshape(h * w, cin), idx.reshape(-1), axis=0)

        g = jax.vmap(gather_b)(x, flat)  # (B, Ho*Wo*K, Cin)
        g = g.reshape(b, ho, wo, k, cin)
        return g * valid[..., None].astype(x.dtype)

    v00 = corner(y0, x0)
    v01 = corner(y0, x0 + 1)
    v10 = corner(y0 + 1, x0)
    v11 = corner(y0 + 1, x0 + 1)

    wy0 = (1.0 - ty)[..., None]
    wy1 = ty[..., None]
    wx0 = (1.0 - tx)[..., None]
    wx1 = tx[..., None]
    cols = wy0 * (wx0 * v00 + wx1 * v01) + wy1 * (wx0 * v10 + wx1 * v11)

    if mask is not None:
        cols = cols * mask[..., None]
    return cols


@partial(
    jax.jit, static_argnames=("kernel_size", "stride", "padding", "dilation")
)
def deform_conv2d(
    x: jax.Array,
    offset: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    mask: jax.Array | None = None,
    *,
    kernel_size=None,
    stride=1,
    padding=1,
    dilation=1,
) -> jax.Array:
    """Modulated deformable conv, NHWC.

    x: (B, H, W, Cin); offset: (B, Ho, Wo, 2K); weight HWIO: (kh, kw, Cin, Cout);
    mask: (B, Ho, Wo, K) or None; returns (B, Ho, Wo, Cout).
    """
    kh, kw, cin, cout = weight.shape
    cols = deform_im2col(
        x, offset, mask, (kh, kw), stride=stride, padding=padding, dilation=dilation
    )
    b, ho, wo = cols.shape[:3]
    # Contract (K, Cin) against the kernel: one MXU matmul.
    w_mat = weight.reshape(kh * kw * cin, cout)
    y = jnp.einsum(
        "bhwq,qo->bhwo",
        cols.reshape(b, ho, wo, kh * kw * cin),
        w_mat.astype(cols.dtype),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def insert_zero_center_offset(offset: jax.Array, kernel_size: int = 3) -> jax.Array:
    """Insert a zero (dy, dx) pair at the center tap.

    The SPN generator predicts offsets for the K-1 non-center taps only
    (reference spn.py:45-52,69-73); the center tap is pinned to zero so the
    refinement always sees the pixel's own value. offset: (B, H, W, 2*(K-1)).
    """
    b, h, w, c = offset.shape
    k = kernel_size * kernel_size
    assert c == 2 * (k - 1), (c, k)
    ctr = (k - 1) // 2
    off = offset.reshape(b, h, w, k - 1, 2)
    zero = jnp.zeros((b, h, w, 1, 2), offset.dtype)
    off = jnp.concatenate([off[:, :, :, :ctr], zero, off[:, :, :, ctr:]], axis=3)
    return off.reshape(b, h, w, 2 * k)
