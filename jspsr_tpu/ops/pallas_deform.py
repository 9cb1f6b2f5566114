"""Fused Pallas TPU kernels for the JSPSR spatial-propagation refinement.

The hot case of modulated deformable convolution (reference spn.py:105-114,
LRRU.py:284-293, nlspn.py:130-139): single-channel DEM, 3x3 kernel, stride 1,
unit dilation, per-tap bilinear sampling modulated by an affinity mask.

Design (v2 — replaces the round-1 (block, tap)-gridded kernel that lost to
XLA 8x by re-reading the image and recomputing iotas per tap):

- grid = (batch, row_block); ONE program owns a (bh, W) strip of output and
  loops the K=9 taps IN-KERNEL, so the image is loaded into VMEM once and the
  accumulator never leaves registers/VMEM — no revisited HBM output, no
  intermediate im2col tensor in HBM (the XLA mxu path materializes
  (B, Ho, Wo, K) columns).
- every tensor keeps P = bh*W on the LANE axis and H/W on sublanes, so no
  in-kernel transposes are needed: positions arrive as (B, nb, K, P) blocks,
  one-hot row weights are built as (H, P), and the sampling matmul is
  dot_general(IMG (H, W), Wy (H, P)) -> (W, P) contracting sublanes (the
  MXU's transposed-lhs form).
- bilinear 2-hot weights are built as a TENT function
  relu(1 - |iota - pos|): exactly the (1-t, t) pair at floor/floor+1, zero
  outside the image (DCNv2 zero-padding semantics), 3 VPU ops instead of the
  6 of the compare-and-blend form.
- backward is a second fused kernel (same layout) computing d_offset, d_mask,
  d_weight partials and (optionally) d_x in one pass, using the
  floor-based one-hot DERIVATIVE (oy1 - oy0) — the tent subgradient is zero
  at exact-integer positions, which would kill offset learning at the
  zero-offset initialization (reference spn.py:49-52 inits offsets at 0).
- ``x_grad=False`` (static) skips the d_x scatter matmul entirely: JSPSR
  detaches the DEM before the SPN head (reference JSPSR.py:372), so a third
  of the backward FLOPs are dead there.

Numerical contract: identical to ops.deform_conv.deform_conv2d (XLA) and the
torchvision golden, verified in tests/test_pallas_deform.py. fp32 only (the
sampling is precision-critical; see ops/deform_conv.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jspsr_tpu.ops import deform_conv as _dc

_F32 = jnp.float32

# Per-program VMEM budget. TPU VMEM is ~16 MB/core; 10 MB leaves headroom
# for the compiler's own buffers. The dominant live tensors scale with
# P = bh*W: the (H, P) tent/one-hot weights and (W, P) partials, plus the
# whole (H, W) image block — at 128^2 tiles everything fits at bh=8, while
# whole-scene inputs (the --infer path pads e.g. 1030^2 -> /8 multiples)
# must shrink bh or fall back to the XLA one-hot path.
_VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def _vmem_estimate(h: int, w: int, bh: int) -> int:
    """Conservative fp32 byte estimate of a program's live VMEM set
    (covers the heavier backward kernel: image + dx accumulator (H,W),
    row iota/one-hots/tent (~4x (H,P)), col iota/wx/tmp/tdy (~4x (W,P)),
    and the 4 (K,P) position/mask/output blocks)."""
    p = bh * w
    k = 9
    return 4 * (2 * h * w + 4 * h * p + 4 * w * p + 4 * k * p)


def _pick_block(h: int, w: int | None = None, target: int = 8) -> int | None:
    """Largest row-block <= target dividing h whose VMEM estimate fits the
    budget; None when even bh=1 cannot fit (caller falls back to XLA)."""
    for b in range(min(target, h), 0, -1):
        if h % b == 0 and (w is None or
                           _vmem_estimate(h, w, b) <= _VMEM_BUDGET_BYTES):
            return b
    return None if w is not None else 1


def _prep_layout(x, offset, mask, padding: int, bh: int | None):
    """Host-side (XLA) re-layout into the kernel's P-on-lanes format."""
    b, h, w, cin = x.shape
    kh = kw = 3
    k = kh * kw
    _, ho, wo, ck = offset.shape
    assert cin == 1 and (ho, wo) == (h, w) and ck == 2 * k
    if bh is None:
        bh = _pick_block(h, w)
        assert bh is not None, (
            f"deform shape H={h}, W={w} exceeds the Pallas VMEM budget even "
            f"at bh=1 — pallas_case_supported should have routed this to "
            f"the XLA path")
    nb = h // bh
    p = bh * w

    py, px = _dc._positions(x.astype(_F32), offset.astype(_F32),
                            (kh, kw), 1, padding, 1)  # (B, H, W, K)
    pos_y = py.reshape(b, nb, p, k).transpose(0, 1, 3, 2)  # (B, nb, K, P)
    pos_x = px.reshape(b, nb, p, k).transpose(0, 1, 3, 2)
    if mask is None:
        mask_t = jnp.ones((b, nb, k, p), _F32)
    else:
        mask_t = mask.astype(_F32).reshape(b, nb, p, k).transpose(0, 1, 3, 2)
    return x[..., 0].astype(_F32), pos_y, pos_x, mask_t, (b, h, w, k, bh, nb, p)


def _fwd_kernel(h, w, k, p, sample_dtype=None):
    # sample_dtype='bfloat16': the per-tap row matmul — the kernel's MXU
    # bottleneck (fp32 matmuls run at 1/4 the bf16 MXU rate) — multiplies
    # the image and the tent weights in bf16 with fp32 accumulation.
    # Positions, tents, the column reduction and the K-tap accumulation
    # stay fp32 (VPU ops, not the bottleneck). Opt-in via the model's
    # spn_sample_dtype (accuracy tradeoff measured in PERF.md).
    sdt = jnp.dtype(sample_dtype) if sample_dtype else None

    def kernel(x_ref, py_ref, px_ref, m_ref, w_ref, b_ref, out_ref):
        img = x_ref[0]  # (H, W) — loaded once per program
        img_mm = img.astype(sdt) if sdt else img
        rows_i = lax.broadcasted_iota(jnp.int32, (h, p), 0).astype(_F32)
        cols_i = lax.broadcasted_iota(jnp.int32, (w, p), 0).astype(_F32)
        acc = jnp.full((1, p), b_ref[0, 0], _F32)
        for t in range(k):  # unrolled: K accumulations in VMEM
            py = py_ref[0, 0, t:t + 1, :]  # (1, P)
            px = px_ref[0, 0, t:t + 1, :]
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(rows_i - py))  # tent (H, P)
            tmp = lax.dot_general(img_mm, wy.astype(sdt) if sdt else wy,
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=_F32)  # (W, P)
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(cols_i - px))
            val = jnp.sum(tmp * wx, axis=0, keepdims=True)  # (1, P)
            acc = acc + w_ref[0, t] * m_ref[0, 0, t:t + 1, :] * val
        out_ref[0, 0] = acc

    return kernel


@partial(jax.jit, static_argnames=("padding", "block_rows", "sample_dtype"))
def _pallas_forward(x, offset, weight, bias, mask, padding: int = 1,
                    block_rows: int | None = None,
                    sample_dtype: str | None = None):
    x2, pos_y, pos_x, mask_t, (b, h, w, k, bh, nb, p) = _prep_layout(
        x, offset, mask, padding, block_rows)
    w_flat = weight.reshape(1, k).astype(_F32)
    b_s = (bias if bias is not None else jnp.zeros((1,))).reshape(1, 1).astype(_F32)

    out = pl.pallas_call(
        _fwd_kernel(h, w, k, p, sample_dtype),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k, p), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k, p), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k, p), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda bi, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda bi, i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, p), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nb, 1, p), _F32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=jax.default_backend() == "cpu",
    )(x2, pos_y, pos_x, mask_t, w_flat, b_s)
    return out.reshape(b, h, w, 1).astype(x.dtype)


def _bwd_kernel(h, w, k, p, need_dx: bool, sample_dtype=None):
    # sample_dtype: same bf16-matmul option as _fwd_kernel — applied to
    # the two image matmuls (value + row-derivative) that dominate the
    # backward's MXU time; one-hot derivative matrices are exact in bf16.
    # The d_x scatter matmul (need_dx) stays fp32: gradients re-enter
    # training state there (x_grad=False in the shipped SPN/LRRU paths,
    # so it is skipped anyway).
    sdt = jnp.dtype(sample_dtype) if sample_dtype else None

    def _mm(a, bmat):
        if sdt is not None:
            a, bmat = a.astype(sdt), bmat.astype(sdt)
        return lax.dot_general(a, bmat, (((0,), (0,)), ((), ())),
                               preferred_element_type=_F32)

    def kernel(x_ref, py_ref, px_ref, m_ref, w_ref, g_ref,
               dpy_ref, dpx_ref, dm_ref, dw_ref, *maybe_dx):
        i = pl.program_id(1)
        img = x_ref[0]
        g = g_ref[0, 0]  # (1, P)
        rows_i = lax.broadcasted_iota(jnp.int32, (h, p), 0).astype(_F32)
        cols_i = lax.broadcasted_iota(jnp.int32, (w, p), 0).astype(_F32)
        dw_parts = []
        dx_acc = jnp.zeros((h, w), _F32) if need_dx else None
        for t in range(k):
            py = py_ref[0, 0, t:t + 1, :]
            px = px_ref[0, 0, t:t + 1, :]
            m = m_ref[0, 0, t:t + 1, :]
            wt = w_ref[0, t]
            y0 = jnp.floor(py)
            x0 = jnp.floor(px)
            oy0 = (rows_i == y0).astype(_F32)
            oy1 = (rows_i == y0 + 1.0).astype(_F32)
            ox0 = (cols_i == x0).astype(_F32)
            ox1 = (cols_i == x0 + 1.0).astype(_F32)
            wy = oy0 * (1.0 - (py - y0)) + oy1 * (py - y0)  # (H, P)
            wx = ox0 * (1.0 - (px - x0)) + ox1 * (px - x0)  # (W, P)

            tmp = _mm(img, wy)  # (W, P)
            val = jnp.sum(tmp * wx, axis=0, keepdims=True)  # (1, P)
            gwm = g * (wt * m)  # cotangent reaching the sample value
            # d_mask = g * w_t * val
            dm_ref[0, 0, t:t + 1, :] = g * wt * val
            # d_w partial = sum_p g * m * val  (summed over programs outside)
            dw_parts.append(jnp.sum(g * m * val).reshape(1, 1))
            # d_px: dval/dpx = sum_w tmp * (ox1 - ox0)   (reuses tmp)
            dpx_ref[0, 0, t:t + 1, :] = gwm * jnp.sum(
                tmp * (ox1 - ox0), axis=0, keepdims=True)
            # d_py: one extra matmul with the derivative one-hots
            tdy = _mm(img, oy1 - oy0)
            dpy_ref[0, 0, t:t + 1, :] = gwm * jnp.sum(
                tdy * wx, axis=0, keepdims=True)
            if need_dx:
                # d_x[h, w] += sum_p wy[h,p] * wx[w,p] * gwm[p]
                dx_acc = dx_acc + lax.dot_general(
                    wy, wx * gwm, (((1,), (1,)), ((), ())),
                    preferred_element_type=_F32)
        dw_ref[0, 0] = jnp.concatenate(dw_parts, axis=1)
        if need_dx:
            dx_ref = maybe_dx[0]

            @pl.when(i == 0)
            def _():
                dx_ref[0] = dx_acc

            @pl.when(i > 0)
            def _():
                dx_ref[0] = dx_ref[0] + dx_acc

    return kernel


@partial(jax.jit, static_argnames=("padding", "x_grad", "block_rows",
                                   "sample_dtype"))
def _pallas_backward(x, offset, weight, bias, mask, g, padding: int = 1,
                     x_grad: bool = True, block_rows: int | None = None,
                     sample_dtype: str | None = None):
    x2, pos_y, pos_x, mask_t, (b, h, w, k, bh, nb, p) = _prep_layout(
        x, offset, mask, padding, block_rows)
    w_flat = weight.reshape(1, k).astype(_F32)
    g2 = g.astype(_F32).reshape(b, nb, 1, p)  # (B, nb, 1, P) blocks

    out_shapes = [
        jax.ShapeDtypeStruct((b, nb, k, p), _F32),  # d_py
        jax.ShapeDtypeStruct((b, nb, k, p), _F32),  # d_px
        jax.ShapeDtypeStruct((b, nb, k, p), _F32),  # d_mask
        jax.ShapeDtypeStruct((b, nb, 1, k), _F32),  # d_w partials
    ]
    out_specs = [
        pl.BlockSpec((1, 1, k, p), lambda bi, i: (bi, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, k, p), lambda bi, i: (bi, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, k, p), lambda bi, i: (bi, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, k), lambda bi, i: (bi, i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if x_grad:
        # revisited (B, H, W) accumulator: row-blocks run sequentially
        out_shapes.append(jax.ShapeDtypeStruct((b, h, w), _F32))
        out_specs.append(pl.BlockSpec((1, h, w), lambda bi, i: (bi, 0, 0),
                                      memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        _bwd_kernel(h, w, k, p, x_grad, sample_dtype),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k, p), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k, p), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k, p), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda bi, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, p), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",
                                 "arbitrary" if x_grad else "parallel"),
        ),
        interpret=jax.default_backend() == "cpu",
    )(x2, pos_y, pos_x, mask_t, w_flat, g2)

    d_py, d_px, d_mask_t, d_w_parts = outs[:4]
    # back to model layouts
    d_py = d_py.transpose(0, 1, 3, 2).reshape(b, h, w, k)
    d_px = d_px.transpose(0, 1, 3, 2).reshape(b, h, w, k)
    d_offset = jnp.stack([d_py, d_px], axis=-1).reshape(b, h, w, 2 * k)
    d_mask = d_mask_t.transpose(0, 1, 3, 2).reshape(b, h, w, k)
    d_weight = jnp.sum(d_w_parts, axis=(0, 1, 2)).reshape(weight.shape)
    d_bias = jnp.sum(g.astype(_F32), axis=(0, 1, 2))
    d_x = (outs[4].reshape(b, h, w, 1) if x_grad
           else jnp.zeros_like(x, _F32))
    return d_x, d_offset, d_mask, d_weight, d_bias


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def deform_conv2d_pallas(x, offset, weight, bias, mask, padding: int = 1,
                         x_grad: bool = True,
                         sample_dtype: str | None = None):
    """Fused modulated deformable conv (1-channel, 3x3, stride 1).

    Semantics == ops.deform_conv.deform_conv2d(..., stride=1, dilation=1).
    x_grad=False (static) skips the input-gradient scatter in the backward
    kernel — correct wherever the DEM input is detached (JSPSR spn head,
    LRRU refinement rounds); the returned d_x is zeros.
    sample_dtype='bfloat16' runs the kernels' image matmuls in bf16 with
    fp32 accumulation (see _fwd_kernel) — opt-in, accuracy tradeoff
    measured in PERF.md.
    """
    return _pallas_forward(x, offset, weight, bias, mask, padding=padding,
                           sample_dtype=sample_dtype)


def _vjp_fwd(x, offset, weight, bias, mask, padding, x_grad, sample_dtype):
    y = _pallas_forward(x, offset, weight, bias, mask, padding=padding,
                        sample_dtype=sample_dtype)
    return y, (x, offset, weight, bias, mask)


def _vjp_bwd(padding, x_grad, sample_dtype, res, g):
    x, offset, weight, bias, mask = res
    d_x, d_offset, d_mask, d_weight, d_bias = _pallas_backward(
        x, offset, weight, bias, mask, g[..., 0],
        padding=padding, x_grad=x_grad, sample_dtype=sample_dtype)
    return (d_x.astype(x.dtype),
            d_offset.astype(offset.dtype),
            d_weight.astype(weight.dtype),
            None if bias is None else d_bias.reshape(bias.shape).astype(bias.dtype),
            None if mask is None else d_mask.astype(mask.dtype))


deform_conv2d_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def pallas_case_supported(x, offset, weight, stride, padding, dilation) -> bool:
    """The fused kernel covers the framework's hot case: 1-channel in/out,
    3x3 kernel, stride 1, unit dilation, offsets on the input grid — AND
    shapes whose per-program working set fits the VMEM budget (whole-scene
    ``--infer`` inputs beyond ~512^2 fall back to the XLA one-hot path
    instead of overflowing VMEM)."""
    kh, kw, cin, cout = weight.shape
    return (cin == 1 and cout == 1 and kh == 3 and kw == 3
            and stride in (1, (1, 1)) and dilation in (1, (1, 1))
            and offset.shape[1:3] == x.shape[1:3]
            and _pick_block(x.shape[1], x.shape[2]) is not None)
