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

from contextlib import contextmanager
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


_IMPL_OVERRIDE: str | None = None


@contextmanager
def force_deform_impl(impl: str):
    """Force the implementation picked by ``impl='auto'`` for every
    deform_conv2d traced inside the context.

    Use case: jax.export artifacts (eval/export.py) must be
    platform-neutral — ONE trace serves CPU and TPU — so the backend-
    dependent auto choice (Pallas custom call on TPU, gather on CPU) is
    pinned to the pure-XLA 'mxu' formulation. The substitution happens in
    the Python wrapper BEFORE the jit boundary, so the compiled-fn cache is
    keyed on the substituted value and never collides with 'auto' traces.
    """
    global _IMPL_OVERRIDE
    prev, _IMPL_OVERRIDE = _IMPL_OVERRIDE, impl
    try:
        yield
    finally:
        _IMPL_OVERRIDE = prev


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


def _positions(x, offset, kernel_size, stride, padding, dilation):
    """Sampling positions py/px of shape (B, Ho, Wo, K)."""
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    b, h, w, _ = x.shape
    _, ho, wo, ck = offset.shape
    k = kh * kw
    assert ck == 2 * k, f"offset channels {ck} != 2*K={2 * k}"
    oy = jnp.arange(ho, dtype=x.dtype) * sh - ph
    ox = jnp.arange(wo, dtype=x.dtype) * sw - pw
    tap_y = jnp.repeat(jnp.arange(kh, dtype=x.dtype) * dh, kw)
    tap_x = jnp.tile(jnp.arange(kw, dtype=x.dtype) * dw, kh)
    off = offset.reshape(b, ho, wo, k, 2)
    py = oy[None, :, None, None] + tap_y[None, None, None, :] + off[..., 0]
    px = ox[None, None, :, None] + tap_x[None, None, None, :] + off[..., 1]
    return py, px


def _pick_block(ho: int, target: int = 8) -> int:
    """Largest divisor of ho that is <= target (>=1)."""
    for b in range(min(target, ho), 0, -1):
        if ho % b == 0:
            return b
    return 1


def deform_im2col_mxu(
    x: jax.Array,
    offset: jax.Array,
    mask: jax.Array | None,
    kernel_size,
    stride=1,
    padding=1,
    dilation=1,
    block_rows: int | None = None,
) -> jax.Array:
    """Deformable im2col via one-hot MXU matmuls (no XLA gather).

    TPU gathers serialize to scalar loads (~100 ms for the JSPSR head);
    instead, bilinear sampling is separable:

        val(p) = wy(p)^T  IMG  wx(p)

    where wy/wx are 2-hot row/column weight vectors. Per row-block we build
    the dense (P, H) row-weight matrix Wy with iota comparisons (VPU), do
    one (P, H) x (H, W*C) matmul on the MXU, then apply the 2-hot column
    weights as an elementwise multiply + reduction. Out-of-range rows/cols
    produce all-zero one-hots — exactly the zero-padding bilinear semantics
    of DCNv2 (a corner contributes iff it is in bounds).

    Cost: K dense (bh*W*K, H) x (H, W*C) matmuls — FLOP-heavy but
    MXU-saturating; ~28x faster than the gather lowering on TPU v5e.
    """
    kh, kw = _pair(kernel_size)
    k = kh * kw
    b, h, w, cin = x.shape
    _, ho, wo, _ = offset.shape
    py, px = _positions(x, offset, kernel_size, stride, padding, dilation)

    bh = block_rows or _pick_block(ho)
    nb = ho // bh
    p_blk = bh * wo * k

    rows_i = jax.lax.broadcasted_iota(x.dtype, (p_blk, h), 1)
    cols_i = jax.lax.broadcasted_iota(x.dtype, (p_blk, w), 1)

    def per_image(img, py_i, px_i):
        # img (H, W, C); py_i/px_i (nb, bh, Wo, K)
        img_flat = img.reshape(h, w * cin)

        def block_fn(_, blk):
            by, bx = blk  # (bh, Wo, K)
            pyf = by.reshape(p_blk)
            pxf = bx.reshape(p_blk)
            y0 = jnp.floor(pyf)
            x0 = jnp.floor(pxf)
            ty = (pyf - y0)[:, None]
            tx = (pxf - x0)[:, None]
            wy = (
                (rows_i == y0[:, None]) * (1.0 - ty)
                + (rows_i == y0[:, None] + 1.0) * ty
            )
            tmp = jnp.dot(wy, img_flat)  # (P, W*C) — MXU
            tmp = tmp.reshape(p_blk, w, cin)
            wx = (
                (cols_i == x0[:, None]) * (1.0 - tx)
                + (cols_i == x0[:, None] + 1.0) * tx
            )
            val = jnp.sum(tmp * wx[:, :, None], axis=1)  # (P, C)
            return None, val.reshape(bh, wo, k, cin)

        _, cols = lax.scan(
            block_fn, None,
            (py_i.reshape(nb, bh, wo, k), px_i.reshape(nb, bh, wo, k)),
        )
        return cols.reshape(ho, wo, k, cin)

    cols = jax.vmap(per_image)(x, py, px)
    if mask is not None:
        cols = cols * mask[..., None]
    return cols


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
    impl: str = "auto",
    x_grad: bool = True,
    sample_dtype: str | None = None,
) -> jax.Array:
    """Modulated deformable conv, NHWC.

    x: (B, H, W, Cin); offset: (B, Ho, Wo, 2K); weight HWIO: (kh, kw, Cin, Cout);
    mask: (B, Ho, Wo, K) or None; returns (B, Ho, Wo, Cout).

    x_grad=False declares that no gradient will be consumed through ``x``
    (e.g. the SPN head's detached DEM, reference JSPSR.py:372) — the fused
    Pallas backward then skips the input-scatter matmul; other impls ignore
    the flag (autodiff prunes the dead branch anyway).

    sample_dtype='bfloat16' (Pallas impl only; others ignore it and stay
    exact fp32) runs the kernel's image matmuls in bf16 with fp32
    accumulation — the MXU-rate fast path behind the model-level
    ``spn_sample_dtype`` option; accuracy tradeoff measured in PERF.md.
    """
    if impl == "auto" and _IMPL_OVERRIDE is not None:
        impl = _IMPL_OVERRIDE
    return _deform_conv2d(x, offset, weight, bias, mask,
                          kernel_size=kernel_size, stride=stride,
                          padding=padding, dilation=dilation, impl=impl,
                          x_grad=x_grad, sample_dtype=sample_dtype)


@partial(
    jax.jit,
    static_argnames=("kernel_size", "stride", "padding", "dilation", "impl",
                     "x_grad", "sample_dtype"),
)
def _deform_conv2d(
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
    impl: str = "auto",
    x_grad: bool = True,
    sample_dtype: str | None = None,
) -> jax.Array:
    kh, kw, cin, cout = weight.shape
    if impl == "auto":
        impl = "mxu" if jax.default_backend() != "cpu" else "gather"
        if impl == "mxu":
            from jspsr_tpu.ops.pallas_deform import pallas_case_supported

            if pallas_case_supported(x, offset, weight, stride, padding,
                                     dilation):
                impl = "pallas"
    # Deformable sampling needs fp32: bf16 offsets quantize positions to
    # ~1/64 px, and bf16 one-hot compare/matmul compiles pathologically on
    # TPU. Compute the sampling in fp32, cast back at the end.
    out_dtype = x.dtype
    if impl == "pallas":
        # fused kernel (forward + fused VJP) for the 1-channel 3x3 hot case:
        # image loaded once per row-block program, all taps accumulated in
        # VMEM, no HBM im2col (ops/pallas_deform.py)
        from jspsr_tpu.ops.pallas_deform import deform_conv2d_pallas

        ph = padding if isinstance(padding, int) else padding[0]
        out = deform_conv2d_pallas(
            x.astype(jnp.float32),
            offset.astype(jnp.float32),
            weight.astype(jnp.float32),
            jnp.zeros((1,), jnp.float32) if bias is None
            else bias.astype(jnp.float32),
            None if mask is None else mask.astype(jnp.float32),
            ph, x_grad, sample_dtype,
        )
        return out.astype(out_dtype)
    if impl == "mxu":
        # custom-VJP path: hand-written backward (matmuls, recomputed
        # one-hots) instead of autodiff's HBM-heavy transposed scan
        from jspsr_tpu.ops.deform_vjp import deform_conv2d_mxu_vjp

        out = deform_conv2d_mxu_vjp(
            x.astype(jnp.float32),
            offset.astype(jnp.float32),
            weight.astype(jnp.float32),
            None if bias is None else bias.astype(jnp.float32),
            None if mask is None else mask.astype(jnp.float32),
            (kh, kw), stride, padding, dilation,
        )
        return out.astype(out_dtype)
    im2col = deform_im2col
    cols = im2col(
        x.astype(jnp.float32),
        offset.astype(jnp.float32),
        None if mask is None else mask.astype(jnp.float32),
        (kh, kw), stride=stride, padding=padding, dilation=dilation,
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
    return y.astype(out_dtype)


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
