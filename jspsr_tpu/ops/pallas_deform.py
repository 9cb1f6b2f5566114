"""Fused Pallas TPU kernel for the JSPSR spatial-propagation refinement.

The hot case of modulated deformable convolution (reference spn.py:105-114):
single-channel DEM, 3x3 kernel, stride 1, unit dilation. One kernel program
covers a (bh, W) block of output rows for one batch element:

- the whole DEM tile lives in VMEM (a 128x128 fp32 tile is 64 KB);
- per tap, bilinear sampling is computed as a 2-hot row-weight matrix times
  the image (one MXU matmul) followed by 2-hot column weights applied on the
  VPU — the same gather-free one-hot formulation as ops.deform_conv's mxu
  path, but fused: offsets -> positions -> weights -> matmul -> modulation ->
  kernel contraction all happen in one VMEM-resident pass, with no
  intermediate im2col tensor in HBM;
- out-of-bounds taps contribute zero automatically (no one-hot match),
  which is exactly DCNv2's zero-padded bilinear semantics.

Training support: `deform_conv2d_pallas` is wrapped in jax.custom_vjp whose
backward differentiates the (numerically identical) XLA mxu formulation, so
the kernel is usable inside jitted train steps.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jspsr_tpu.ops import deform_conv as _dc


def _make_kernel(h: int, w: int, bh: int, k: int, pad: int):
    kk = k * k
    p_rows = bh * w

    def kernel(x_ref, off_ref, mask_ref, w_ref, b_ref, out_ref):
        blk = pl.program_id(1)
        img = x_ref[0]  # (H, W)
        acc = jnp.zeros((bh, w), jnp.float32)

        row_base = (blk * bh - pad).astype(jnp.float32)
        oy = row_base + jax.lax.broadcasted_iota(jnp.float32, (bh, w), 0)
        ox = jax.lax.broadcasted_iota(jnp.float32, (bh, w), 1) - pad
        rows_i = jax.lax.broadcasted_iota(jnp.float32, (p_rows, h), 1)
        cols_i = jax.lax.broadcasted_iota(jnp.float32, (p_rows, w), 1)

        for t in range(kk):
            ty_tap = t // k
            tx_tap = t % k
            py = oy + ty_tap + off_ref[0, :, :, 2 * t]
            px = ox + tx_tap + off_ref[0, :, :, 2 * t + 1]
            pyf = py.reshape(p_rows, 1)
            pxf = px.reshape(p_rows, 1)
            y0 = jnp.floor(pyf)
            x0 = jnp.floor(pxf)
            ty = pyf - y0
            tx = pxf - x0
            wy = (rows_i == y0) * (1.0 - ty) + (rows_i == y0 + 1.0) * ty
            tmp = jnp.dot(wy, img, preferred_element_type=jnp.float32)
            wx = (cols_i == x0) * (1.0 - tx) + (cols_i == x0 + 1.0) * tx
            val = jnp.sum(tmp * wx, axis=1).reshape(bh, w)
            acc = acc + w_ref[0, t] * mask_ref[0, :, :, t] * val

        out_ref[0] = acc + b_ref[0, 0]

    return kernel


def _pick_block(h: int, target: int = 8) -> int:
    for b in range(min(target, h), 0, -1):
        if h % b == 0:
            return b
    return 1


@partial(jax.jit, static_argnames=("padding",))
def _pallas_forward(x, offset, weight, bias, mask, padding: int = 1):
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    assert cin == 1 and cout == 1 and kh == kw, "pallas path: 1ch, square k"
    k = kh
    kk = k * k
    bh = _pick_block(h)
    kernel = _make_kernel(h, w, bh, k, padding)
    w_flat = weight.reshape(1, kk).astype(jnp.float32)
    b_s = bias.reshape(1, 1).astype(jnp.float32)

    out = pl.pallas_call(
        kernel,
        grid=(b, h // bh),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh, w, 2 * kk), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh, w, kk), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kk), lambda bi, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda bi, i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, w), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(
        x[..., 0].astype(jnp.float32),
        offset.astype(jnp.float32),
        mask.astype(jnp.float32),
        w_flat,
        b_s,
    )
    return out[..., None].astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def deform_conv2d_pallas(x, offset, weight, bias, mask, padding: int = 1):
    """Fused modulated deformable conv (1-channel, square kernel, stride 1).

    Semantics == ops.deform_conv.deform_conv2d(..., stride=1, dilation=1).
    """
    return _pallas_forward(x, offset, weight, bias, mask, padding=padding)


def _fwd(x, offset, weight, bias, mask, padding):
    y = _pallas_forward(x, offset, weight, bias, mask, padding=padding)
    return y, (x, offset, weight, bias, mask)


def _bwd(padding, res, g):
    x, offset, weight, bias, mask = res

    def ref(x, offset, weight, bias, mask):
        return _dc.deform_conv2d(x, offset, weight, bias, mask,
                                 stride=1, padding=padding, dilation=1,
                                 impl="mxu")

    _, vjp = jax.vjp(ref, x, offset, weight, bias, mask)
    return vjp(g)


deform_conv2d_pallas.defvjp(_fwd, _bwd)
