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
