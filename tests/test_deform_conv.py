"""XLA deformable conv vs the independent numpy golden model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jspsr_tpu.ops.deform_conv import (
    deform_conv2d,
    insert_zero_center_offset,
)
from tests.golden.deform_conv_numpy import deform_conv2d_np


def _run_case(b, cin, cout, h, w, k, stride, pad, dil, with_mask, off_scale, seed):
    rng = np.random.default_rng(seed)
    ho = (h + 2 * pad - dil * (k - 1) - 1) // stride + 1
    wo = (w + 2 * pad - dil * (k - 1) - 1) // stride + 1
    kk = k * k
    x = rng.normal(size=(b, cin, h, w)).astype(np.float32)
    offset = (rng.normal(size=(b, 2 * kk, ho, wo)) * off_scale).astype(np.float32)
    mask = rng.uniform(0, 1, size=(b, kk, ho, wo)).astype(np.float32) if with_mask else None
    weight = rng.normal(size=(cout, cin, k, k)).astype(np.float32)
    bias = rng.normal(size=(cout,)).astype(np.float32)

    ref = deform_conv2d_np(x, offset, weight, bias, mask, stride, pad, dil)

    y = deform_conv2d(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(offset.transpose(0, 2, 3, 1)),
        jnp.asarray(weight.transpose(2, 3, 1, 0)),
        jnp.asarray(bias),
        jnp.asarray(mask.transpose(0, 2, 3, 1)) if mask is not None else None,
        stride=stride,
        padding=pad,
        dilation=dil,
    )
    got = np.asarray(y).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "case",
    [
        # the JSPSR hot case: 1->1 channels, 3x3, stride 1, pad 1, modulated
        dict(b=2, cin=1, cout=1, h=12, w=12, k=3, stride=1, pad=1, dil=1,
             with_mask=True, off_scale=2.0, seed=0),
        # multi-channel
        dict(b=1, cin=3, cout=4, h=9, w=11, k=3, stride=1, pad=1, dil=1,
             with_mask=True, off_scale=1.5, seed=1),
        # no mask
        dict(b=2, cin=2, cout=2, h=8, w=8, k=3, stride=1, pad=1, dil=1,
             with_mask=False, off_scale=3.0, seed=2),
        # stride 2, dilation 2, 5x5
        dict(b=1, cin=1, cout=2, h=14, w=14, k=5, stride=2, pad=2, dil=1,
             with_mask=True, off_scale=1.0, seed=3),
        dict(b=1, cin=2, cout=1, h=13, w=13, k=3, stride=2, pad=1, dil=2,
             with_mask=True, off_scale=1.0, seed=4),
        # huge offsets -> mostly out of bounds (zero-pad semantics)
        dict(b=1, cin=1, cout=1, h=8, w=8, k=3, stride=1, pad=1, dil=1,
             with_mask=True, off_scale=20.0, seed=5),
        # zero offsets == ordinary conv
        dict(b=1, cin=2, cout=3, h=10, w=10, k=3, stride=1, pad=1, dil=1,
             with_mask=False, off_scale=0.0, seed=6),
    ],
)
def test_deform_conv_matches_numpy_golden(case):
    _run_case(**case)


def test_zero_offset_equals_plain_conv():
    """With zero offsets and unit mask, deform_conv == lax conv."""
    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 16, 16, 4)).astype(np.float32)
    w = rng.normal(size=(3, 3, 4, 5)).astype(np.float32)
    offset = np.zeros((2, 16, 16, 18), np.float32)
    y = deform_conv2d(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(w))
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_insert_zero_center_offset():
    b, h, w = 1, 2, 2
    off = np.arange(b * h * w * 16, dtype=np.float32).reshape(b, h, w, 16)
    out = np.asarray(insert_zero_center_offset(jnp.asarray(off), 3))
    assert out.shape == (b, h, w, 18)
    # taps 0..3 unchanged, tap 4 (center) zero, taps 5..8 shifted
    np.testing.assert_array_equal(out[..., :8], off[..., :8])
    np.testing.assert_array_equal(out[..., 8:10], 0.0)
    np.testing.assert_array_equal(out[..., 10:], off[..., 8:])


def test_gradients_flow_everywhere():
    """Autodiff VJP: nonzero grads for x, offset, mask, weight, bias."""
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 1)).astype(np.float32))
    offset = jnp.asarray((rng.normal(size=(1, 8, 8, 18)) * 0.7).astype(np.float32))
    mask = jnp.asarray(rng.uniform(0.2, 1, size=(1, 8, 8, 9)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 1, 1)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(1,)).astype(np.float32))

    def loss(x, offset, mask, w, b):
        return jnp.sum(deform_conv2d(x, offset, w, b, mask) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, offset, mask, w, b)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

    # finite-difference check on the offset gradient (the tricky path)
    eps = 1e-3
    g_off = np.asarray(grads[1])
    idx = (0, 3, 4, 7)
    off_p = offset.at[idx].add(eps)
    off_m = offset.at[idx].add(-eps)
    fd = (loss(x, off_p, mask, w, b) - loss(x, off_m, mask, w, b)) / (2 * eps)
    np.testing.assert_allclose(g_off[idx], float(fd), rtol=2e-2, atol=1e-3)


@pytest.mark.parametrize(
    "case",
    [
        dict(b=2, cin=1, cout=1, h=12, w=12, k=3, stride=1, pad=1, dil=1,
             with_mask=True, off_scale=2.0, seed=20),
        dict(b=1, cin=3, cout=4, h=16, w=12, k=3, stride=1, pad=1, dil=1,
             with_mask=True, off_scale=1.5, seed=21),
        dict(b=1, cin=1, cout=2, h=14, w=14, k=5, stride=2, pad=2, dil=1,
             with_mask=True, off_scale=1.0, seed=22),
        dict(b=1, cin=1, cout=1, h=8, w=8, k=3, stride=1, pad=1, dil=1,
             with_mask=True, off_scale=20.0, seed=23),
    ],
)
def test_mxu_impl_matches_gather_impl(case):
    """The one-hot-matmul (TPU fast path) im2col vs the gather reference."""
    rng = np.random.default_rng(case["seed"])
    b, cin, cout = case["b"], case["cin"], case["cout"]
    h, w, k = case["h"], case["w"], case["k"]
    stride, pad, dil = case["stride"], case["pad"], case["dil"]
    ho = (h + 2 * pad - dil * (k - 1) - 1) // stride + 1
    wo = (w + 2 * pad - dil * (k - 1) - 1) // stride + 1
    kk = k * k
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)).astype(np.float32))
    offset = jnp.asarray(
        (rng.normal(size=(b, ho, wo, 2 * kk)) * case["off_scale"]).astype(np.float32))
    mask = jnp.asarray(rng.uniform(0, 1, size=(b, ho, wo, kk)).astype(np.float32))
    weight = jnp.asarray(rng.normal(size=(k, k, cin, cout)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    kw = dict(stride=stride, padding=pad, dilation=dil)
    y_g = deform_conv2d(x, offset, weight, bias, mask, impl="gather", **kw)
    y_m = deform_conv2d(x, offset, weight, bias, mask, impl="mxu", **kw)
    np.testing.assert_allclose(np.asarray(y_m), np.asarray(y_g),
                               rtol=1e-4, atol=1e-4)


def test_mxu_impl_gradients_match_gather():
    rng = np.random.default_rng(30)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 1)).astype(np.float32))
    offset = jnp.asarray((rng.normal(size=(1, 8, 8, 18)) * 0.7).astype(np.float32))
    mask = jnp.asarray(rng.uniform(0.2, 1, size=(1, 8, 8, 9)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 1, 1)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(1,)).astype(np.float32))

    def loss(impl):
        def f(x, offset, mask, w, b):
            return jnp.sum(deform_conv2d(x, offset, w, b, mask, impl=impl) ** 2)
        return f

    g_g = jax.grad(loss("gather"), argnums=(0, 1, 2, 3, 4))(x, offset, mask, w, b)
    g_m = jax.grad(loss("mxu"), argnums=(0, 1, 2, 3, 4))(x, offset, mask, w, b)
    for a, c in zip(g_g, g_m):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)
