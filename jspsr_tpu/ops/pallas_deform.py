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

STATUS (v5e, batch 16 x 128^2, fp32): correct on real TPU (matches the XLA
path to 5e-7) but ~8x slower (17.8 ms vs 2.1 ms): this op's matmuls are
small and the one-hot construction is VPU-bound, so XLA's fused scan
pipeline beats a (block, tap)-gridded kernel with its per-program iota
recompute + revisited-output traffic. ops.deform_conv(impl="mxu") stays the
production path; this kernel is kept as the Pallas reference implementation
(and the scaffold for a future flash-style multi-tap fused variant).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jspsr_tpu.ops import deform_conv as _dc


def _make_kernel(h: int, w: int, bh: int, k: int, pad: int):
    """One grid step = one (row-block, tap) pair. Taps live on the last
    (sequential, 'arbitrary') grid dimension and ACCUMULATE into the same
    revisited output block, so per-tap VMEM buffers are reused and the
    per-tap offset/mask slices arrive via BlockSpec index maps (no dynamic
    lane slicing, which Mosaic rejects). All tensors stay 2D — cross-lane
    reshapes like (bh, W) -> (P, 1) are unsupported; the host pre-flattens
    the P = bh*W axis."""
    kk = k * k
    p_rows = bh * w

    def kernel(x_ref, offy_ref, offx_ref, mask_ref, w_ref, b_ref, out_ref):
        blk = pl.program_id(1)
        t = pl.program_id(2)
        img = x_ref[0]  # (H, W)

        p_i = jax.lax.broadcasted_iota(jnp.int32, (p_rows, 1), 0)
        row_base = blk * bh - pad
        oy = (row_base + p_i // w).astype(jnp.float32)
        ox = (p_i % w - pad).astype(jnp.float32)
        rows_i = jax.lax.broadcasted_iota(
            jnp.int32, (p_rows, h), 1).astype(jnp.float32)
        cols_i = jax.lax.broadcasted_iota(
            jnp.int32, (p_rows, w), 1).astype(jnp.float32)

        py = oy + (t // k).astype(jnp.float32) + offy_ref[0, 0, 0]
        px = ox + (t % k).astype(jnp.float32) + offx_ref[0, 0, 0]
        y0 = jnp.floor(py)
        x0 = jnp.floor(px)
        ty = py - y0
        tx = px - x0
        wy = (rows_i == y0) * (1.0 - ty) + (rows_i == y0 + 1.0) * ty
        tmp = jnp.dot(wy, img, preferred_element_type=jnp.float32)
        wx = (cols_i == x0) * (1.0 - tx) + (cols_i == x0 + 1.0) * tx
        val = jnp.sum(tmp * wx, axis=1, keepdims=True)  # (P, 1)
        contrib = w_ref[0, t] * mask_ref[0, 0, 0] * val

        @pl.when(t == 0)
        def _():
            out_ref[0, 0] = contrib + b_ref[0, 0]

        @pl.when(t > 0)
        def _():
            out_ref[0, 0] = out_ref[0, 0] + contrib

    return kernel


def _pick_block(h: int, target: int = 16) -> int:
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
    nb = h // bh
    p_rows = bh * w
    kernel = _make_kernel(h, w, bh, k, padding)
    w_flat = weight.reshape(1, kk).astype(jnp.float32)
    b_s = bias.reshape(1, 1).astype(jnp.float32)

    # tap-leading host layouts: (B, K, nb, P, 1) so per-tap blocks satisfy
    # Mosaic's (sublane%8, lane%128-or-full) block constraints
    off5 = offset.astype(jnp.float32).reshape(b, nb, p_rows, kk, 2)
    off_y = off5[..., 0].transpose(0, 3, 1, 2)[..., None]
    off_x = off5[..., 1].transpose(0, 3, 1, 2)[..., None]
    mask_t = (
        mask.astype(jnp.float32).reshape(b, nb, p_rows, kk)
        .transpose(0, 3, 1, 2)[..., None]
    )

    out = pl.pallas_call(
        kernel,
        grid=(b, nb, kk),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda bi, i, t: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, p_rows, 1),
                         lambda bi, i, t: (bi, t, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, p_rows, 1),
                         lambda bi, i, t: (bi, t, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, p_rows, 1),
                         lambda bi, i, t: (bi, t, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kk), lambda bi, i, t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda bi, i, t: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, p_rows, 1), lambda bi, i, t: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, nb, p_rows, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() == "cpu",
    )(
        x[..., 0].astype(jnp.float32),
        off_y,
        off_x,
        mask_t,
        w_flat,
        b_s,
    )
    return out.reshape(b, h, w, 1).astype(x.dtype)


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
