"""Custom VJP for the one-hot-matmul deformable convolution.

Why: JAX autodiff of the blocked one-hot formulation transposes the scan and
SAVES the (P, H) one-hot weight matrices of every block to HBM — gigabytes of
residual traffic that dominates the train step (PERF.md). The hand-written
backward recomputes the 2-hot weights from the (tiny) positions instead and
expresses every gradient as dense matmuls:

    S[p, c]      = wy_p^T IMG wx_p                          (forward)
    dIMG        += Wy^T (G .* Wx)          per block         (1 matmul)
    d_py[p]      = sum_c G[p,c] * ((onehot(y0+1)-onehot(y0)) IMG wx)_c
    d_px[p]      = sum_c G[p,c] * (wy IMG (onehot(x0+1)-onehot(x0)))_c
    d_mask       = <G_w, S>,  d_W = <g, mask.*S>,  d_b = sum g

where G is the cotangent reaching the samples. Cost: ~3 extra matmuls of the
forward's size; residuals saved: inputs + the im2col columns only.

Out-of-bounds corners carry all-zero one-hots, so their gradients vanish
exactly as in the DCNv2 CUDA kernel; floor() boundaries use the a.e.
derivative (same as autodiff).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from jspsr_tpu.ops import deform_conv as _dc


def _block_geometry(ho: int, wo: int, k: int, block_rows: int | None):
    bh = block_rows or _dc._pick_block(ho)
    return bh, ho // bh, bh * wo * k


def _deform_cols_and_out(x, offset, weight, bias, mask, kernel_size, stride,
                         padding, dilation):
    kh, kw, cin, cout = weight.shape
    cols = _dc.deform_im2col_mxu(x, offset, None, (kh, kw), stride=stride,
                                 padding=padding, dilation=dilation)
    mcols = cols if mask is None else cols * mask[..., None]
    b, ho, wo = cols.shape[:3]
    out = jnp.einsum(
        "bhwq,qo->bhwo",
        mcols.reshape(b, ho, wo, kh * kw * cin),
        weight.reshape(kh * kw * cin, cout),
    )
    if bias is not None:
        out = out + bias
    return out, cols


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def deform_conv2d_mxu_vjp(x, offset, weight, bias, mask,
                          kernel_size, stride, padding, dilation):
    out, _ = _deform_cols_and_out(x, offset, weight, bias, mask, kernel_size,
                                  stride, padding, dilation)
    return out


def _fwd(x, offset, weight, bias, mask, kernel_size, stride, padding,
         dilation):
    out, cols = _deform_cols_and_out(x, offset, weight, bias, mask,
                                     kernel_size, stride, padding, dilation)
    return out, (x, offset, weight, bias, mask, cols)


def _bwd(kernel_size, stride, padding, dilation, res, g):
    x, offset, weight, bias, mask, cols = res
    kh, kw, cin, cout = weight.shape
    k = kh * kw
    b, h, w, _ = x.shape
    _, ho, wo, _ = offset.shape

    g = g.astype(jnp.float32)
    w_mat = weight.reshape(k, cin, cout).astype(jnp.float32)

    d_bias = jnp.sum(g, axis=(0, 1, 2))
    mcols = cols if mask is None else cols * mask[..., None]
    d_weight = jnp.einsum("bhwo,bhwkc->kco", g, mcols).reshape(weight.shape)
    # cotangent reaching the masked columns
    g_mcols = jnp.einsum("bhwo,kco->bhwkc", g, w_mat)
    d_mask = None if mask is None else jnp.sum(g_mcols * cols, axis=-1)
    g_cols = g_mcols if mask is None else g_mcols * mask[..., None]

    # per-block matmul pass for d_x and d_offset
    py, px = _dc._positions(x.astype(jnp.float32), offset.astype(jnp.float32),
                            kernel_size, stride, padding, dilation)
    bh, nb, p_blk = _block_geometry(ho, wo, k, None)
    rows_i = lax.broadcasted_iota(jnp.float32, (p_blk, h), 1)
    cols_i = lax.broadcasted_iota(jnp.float32, (p_blk, w), 1)

    def per_image(img, py_i, px_i, gcols_i):
        img_flat = img.reshape(h, w * cin).astype(jnp.float32)

        def block_fn(d_img_acc, blk):
            by, bx, gc = blk  # (bh,Wo,K), (bh,Wo,K), (bh,Wo,K,C)
            pyf = by.reshape(p_blk)
            pxf = bx.reshape(p_blk)
            gcf = gc.reshape(p_blk, cin)
            y0 = jnp.floor(pyf)
            x0 = jnp.floor(pxf)
            ty = (pyf - y0)[:, None]
            tx = (pxf - x0)[:, None]
            oy0 = (rows_i == y0[:, None]).astype(jnp.float32)
            oy1 = (rows_i == y0[:, None] + 1.0).astype(jnp.float32)
            ox0 = (cols_i == x0[:, None]).astype(jnp.float32)
            ox1 = (cols_i == x0[:, None] + 1.0).astype(jnp.float32)
            wy = oy0 * (1.0 - ty) + oy1 * ty          # (P, H)
            wx = ox0 * (1.0 - tx) + ox1 * tx          # (P, W)

            # d_img += Wy^T @ (Wx .* G)
            m = (wx[:, :, None] * gcf[:, None, :]).reshape(p_blk, w * cin)
            d_img_acc = d_img_acc + jnp.dot(wy.T, m)

            # d_py = <G, (oy1-oy0) IMG wx> ; d_px = <G, wy IMG (ox1-ox0)>
            t_dy = jnp.dot(oy1 - oy0, img_flat).reshape(p_blk, w, cin)
            d_py = jnp.sum(t_dy * wx[:, :, None] * gcf[:, None, :],
                           axis=(1, 2))
            tmp = jnp.dot(wy, img_flat).reshape(p_blk, w, cin)
            d_px = jnp.sum(tmp * (ox1 - ox0)[:, :, None] * gcf[:, None, :],
                           axis=(1, 2))
            d_off_blk = jnp.stack(
                [d_py.reshape(bh, wo, k), d_px.reshape(bh, wo, k)], axis=-1
            )  # (bh, Wo, K, 2)
            return d_img_acc, d_off_blk

        d_img0 = jnp.zeros((h, w * cin), jnp.float32)
        d_img, d_off = lax.scan(
            block_fn, d_img0,
            (py_i.reshape(nb, bh, wo, k), px_i.reshape(nb, bh, wo, k),
             gcols_i.reshape(nb, bh, wo, k, cin)),
        )
        return d_img.reshape(h, w, cin), d_off.reshape(ho, wo, k, 2)

    d_x, d_off = jax.vmap(per_image)(x, py, px, g_cols)
    d_offset = d_off.reshape(b, ho, wo, 2 * k)

    return (d_x.astype(x.dtype), d_offset.astype(offset.dtype),
            d_weight.astype(weight.dtype),
            None if bias is None else d_bias.astype(bias.dtype),
            None if mask is None else d_mask.astype(mask.dtype))


deform_conv2d_mxu_vjp.defvjp(_fwd, _bwd)
