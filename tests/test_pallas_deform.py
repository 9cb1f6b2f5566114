"""Pallas fused deformable kernel vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from jspsr_tpu.ops.deform_conv import deform_conv2d
from jspsr_tpu.ops.pallas_deform import deform_conv2d_pallas


def _case(b, h, w, off_scale, seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, h, w, 1)).astype(np.float32))
    off = jnp.asarray((rng.normal(size=(b, h, w, 18)) * off_scale)
                      .astype(np.float32))
    mask = jnp.asarray(rng.uniform(0, 1, size=(b, h, w, 9)).astype(np.float32))
    wgt = jnp.asarray(rng.normal(size=(3, 3, 1, 1)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(1,)).astype(np.float32))
    return x, off, mask, wgt, bias


def test_pallas_matches_xla_reference():
    for off_scale, seed in ((0.0, 0), (1.5, 1), (20.0, 2)):
        x, off, mask, wgt, bias = _case(2, 16, 16, off_scale, seed)
        ref = deform_conv2d(x, off, wgt, bias, mask, impl="gather")
        got = deform_conv2d_pallas(x, off, wgt, bias, mask, 1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"off_scale={off_scale}")


def test_pallas_block_boundaries():
    """h not divisible by the default block target."""
    x, off, mask, wgt, bias = _case(1, 12, 20, 2.0, 3)
    ref = deform_conv2d(x, off, wgt, bias, mask, impl="gather")
    got = deform_conv2d_pallas(x, off, wgt, bias, mask, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_custom_vjp_matches_xla_grad():
    x, off, mask, wgt, bias = _case(1, 8, 8, 0.7, 4)

    def loss_pallas(x, off, mask, wgt, bias):
        return jnp.sum(deform_conv2d_pallas(x, off, wgt, bias, mask, 1) ** 2)

    def loss_xla(x, off, mask, wgt, bias):
        return jnp.sum(deform_conv2d(x, off, wgt, bias, mask,
                                     impl="gather") ** 2)

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(x, off, mask, wgt, bias)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(x, off, mask, wgt, bias)
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_pallas_grad_at_zero_offsets():
    """The SPN generator initializes offsets at exactly 0 (reference
    spn.py:49-52): integer sampling positions. The backward kernel must use
    the floor-based one-hot derivative (forward difference) there — a tent
    subgradient would return zero and kill offset learning at init."""
    x, off, mask, wgt, bias = _case(1, 8, 16, 0.0, 7)

    def loss_pallas(off):
        return jnp.sum(deform_conv2d_pallas(x, off, wgt, bias, mask, 1) ** 2)

    def loss_xla(off):
        return jnp.sum(deform_conv2d(x, off, wgt, bias, mask,
                                     impl="gather") ** 2)

    g_p = jax.grad(loss_pallas)(off)
    g_x = jax.grad(loss_xla)(off)
    assert float(jnp.max(jnp.abs(g_x))) > 0  # the oracle learns offsets
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=1e-3, atol=1e-4)


def test_pallas_x_grad_false_skips_input_grad():
    """x_grad=False (detached-DEM call sites) returns zero d_x and identical
    gradients for every other input."""
    x, off, mask, wgt, bias = _case(1, 8, 16, 1.0, 8)

    def loss(x, off, mask, wgt, bias, xg):
        return jnp.sum(deform_conv2d_pallas(x, off, wgt, bias, mask, 1, xg) ** 2)

    g_t = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, off, mask, wgt, bias, True)
    g_f = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, off, mask, wgt, bias, False)
    assert float(jnp.max(jnp.abs(g_f[0]))) == 0.0
    for a, b in zip(g_t[1:], g_f[1:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_impl_pallas_routing():
    """deform_conv2d(impl='pallas') routes the supported hot case through the
    fused kernel; unsupported shapes are rejected by pallas_case_supported."""
    from jspsr_tpu.ops.pallas_deform import pallas_case_supported

    x, off, mask, wgt, bias = _case(1, 8, 16, 1.0, 9)
    assert pallas_case_supported(x, off, wgt, 1, 1, 1)
    got = deform_conv2d(x, off, wgt, bias, mask, impl="pallas")
    ref = deform_conv2d(x, off, wgt, bias, mask, impl="gather")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # multi-channel: not the fused case
    wgt2 = jnp.tile(wgt, (1, 1, 2, 1))
    x2 = jnp.tile(x, (1, 1, 1, 2))
    assert not pallas_case_supported(x2, off, wgt2, 1, 1, 1)


def test_vmem_budget_guard():
    """Scene-size shapes must not silently overflow VMEM (round-2 VERDICT
    #7): the row-block shrinks as W grows, and shapes where even bh=1
    exceeds the ~10MB budget are rejected so impl='auto' routes them to the
    XLA one-hot path instead."""
    from jspsr_tpu.ops.pallas_deform import (
        _pick_block, _vmem_estimate, _VMEM_BUDGET_BYTES,
        pallas_case_supported,
    )

    # production tile: full bh=8 block, well inside budget
    assert _pick_block(128, 128) == 8
    assert _vmem_estimate(128, 128, 8) < _VMEM_BUDGET_BYTES
    # mid scenes shrink the block but stay on Pallas
    bh = _pick_block(256, 256)
    assert bh is not None and bh < 8
    assert _vmem_estimate(256, 256, bh) <= _VMEM_BUDGET_BYTES
    # huge scenes are rejected outright
    assert _pick_block(1024, 1024) is None

    def sup(h, w):
        x = jnp.zeros((1, h, w, 1), jnp.float32)
        off = jnp.zeros((1, h, w, 18), jnp.float32)
        wgt = jnp.zeros((3, 3, 1, 1), jnp.float32)
        return pallas_case_supported(x, off, wgt, 1, 1, 1)

    assert sup(128, 128) and sup(256, 256)
    assert not sup(1024, 1024)


def test_pallas_shrunken_block_matches_reference():
    """A shape that forces a sub-default row-block through the budget pick
    still computes exactly (fwd + grads through the fused VJP)."""
    from jspsr_tpu.ops.pallas_deform import _pick_block

    h = w = 40
    # force the budget path by shrinking the budget via explicit block_rows:
    # run with the same bh the guard would pick for a big W
    x, off, mask, wgt, bias = _case(1, h, w, 2.0, 7)
    ref = deform_conv2d(x, off, wgt, bias, mask, impl="gather")
    from jspsr_tpu.ops.pallas_deform import _pallas_forward

    for bh in (1, 2, 5):
        got = _pallas_forward(x, off, wgt, bias, mask, padding=1,
                              block_rows=bh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4, err_msg=f"bh={bh}")


def test_pallas_sample_dtype_bf16_close_and_grads_flow():
    """sample_dtype='bfloat16' (the opt-in MXU fast path behind
    spn_sample_dtype) runs the kernel's image matmuls in bf16 with fp32
    accumulation: outputs must track the exact fp32 kernel to bf16
    quantization tolerance, and the custom VJP must keep producing
    finite, close gradients for offsets/mask/weight/bias."""
    x, off, mask, wgt, bias = _case(2, 16, 16, 1.5, 7)
    exact = deform_conv2d_pallas(x, off, wgt, bias, mask, 1)
    fast = deform_conv2d_pallas(x, off, wgt, bias, mask, 1, True,
                                "bfloat16")
    # bf16 mantissa is 8 bits: elementwise error ~2^-8 * |operands|
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               rtol=0.05, atol=0.05)
    assert np.abs(np.asarray(fast) - np.asarray(exact)).max() > 0 \
        or float(jnp.sum(jnp.abs(exact))) == 0  # genuinely quantized path

    def loss(off, mask, wgt, bias, sdt):
        return jnp.sum(deform_conv2d_pallas(x, off, wgt, bias, mask, 1,
                                            False, sdt) ** 2)

    g_fast = jax.grad(loss, argnums=(0, 1, 2, 3))(off, mask, wgt, bias,
                                                  "bfloat16")
    g_exact = jax.grad(loss, argnums=(0, 1, 2, 3))(off, mask, wgt, bias,
                                                   None)
    for a, b in zip(g_fast, g_exact):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.2, atol=0.3)

    # the model-level plumbing: spn_sample_dtype reaches the kernel
    from jspsr_tpu.config.loader import AttrDict
    from jspsr_tpu.models.factory import build_model

    p = AttrDict({"model_name": "JSPSR",
                  "input_data": {"lr_dem": 1, "image": 3},
                  "model_kwargs": {"num_block": 1, "num_feature": 8,
                                   "spn_sample_dtype": "bfloat16"}})
    m = build_model(p)
    assert m.postprocessor.sample_dtype == "bfloat16"
