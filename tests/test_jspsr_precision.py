"""Fused stems + mixed-precision body of JSPSR.

- fuse_stems: the block-diagonal single-conv stem must equal the three
  separate Basic2d stems to fp32 rounding AT THE STEM OUTPUTS (whole-model
  outputs amplify 1e-6 reorder noise through ~30 random-init layers, so the
  contract is checked where it is exact).
- compute_dtype=bfloat16: the body runs in bf16 but the output and every
  parameter gradient must be fp32 and finite; the raw DEM path must never
  be quantized (output equals the fp32 model within a loose tolerance on a
  smooth input).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jspsr_tpu.models.jspsr import JSPSR


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    dem = jnp.asarray(rng.uniform(0.3, 0.7, (2, 32, 32, 1)).astype(np.float32))
    img = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    msk = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 15)).astype(np.float32))
    return [dem, img, msk]


@pytest.fixture(scope="module")
def fused_model(inputs):
    model = JSPSR({"lr_dem": 1, "image": 3, "mask": 15}, num_feature=16,
                  layers=(1, 1, 1, 1), fuse_stems=True)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    return model, params, bn_state


def test_fused_stems_equal_separate(inputs, fused_model):
    model, params, bn_state = fused_model
    dem, img, msk = inputs
    stems = [("conv_dem", "dem", dem), ("conv_img", "img", img),
             ("conv_aux", "aux", msk)]
    for train in (False, True):
        fused = model._fused_stems(params, bn_state, {}, stems,
                                   jnp.dtype(jnp.float32), train)
        for name, key, x in stems:
            mod = getattr(model, name)
            sep, _ = mod(params[name], bn_state.get(name, {}), x, train=train)
            np.testing.assert_allclose(np.asarray(fused[key]),
                                       np.asarray(sep), atol=2e-5)


def test_fused_stems_bn_state_updates(inputs, fused_model):
    model, params, bn_state = fused_model
    dem, img, msk = inputs
    stems = [("conv_dem", "dem", dem), ("conv_img", "img", img),
             ("conv_aux", "aux", msk)]
    ns = {}
    model._fused_stems(params, bn_state, ns, stems, jnp.dtype(jnp.float32),
                       True)
    # only the image stem has BN (reference JSPSR.py:66-87)
    assert set(ns) == {"conv_img"} and "bn" in ns["conv_img"]
    sep, s = model.conv_img(params["conv_img"], bn_state["conv_img"], img,
                            train=True)
    np.testing.assert_allclose(
        np.asarray(ns["conv_img"]["bn"]["mean"]),
        np.asarray(s["bn"]["mean"]), atol=1e-5)


def test_fused_stems_two_branch(inputs):
    dem, img, _ = inputs
    m = JSPSR({"lr_dem": 1, "image": 3}, num_feature=16, layers=(1, 1, 1, 1))
    p, s = m.init(jax.random.PRNGKey(1))
    out, _ = m(p, s, [dem, img], train=False)
    assert out.shape == dem.shape and out.dtype == jnp.float32


def test_bf16_body_output_and_grads_fp32(inputs):
    dem, img, msk = inputs
    m = JSPSR({"lr_dem": 1, "image": 3, "mask": 15}, num_feature=16,
              layers=(1, 1, 1, 1), compute_dtype="bfloat16")
    p, s = m.init(jax.random.PRNGKey(0))
    out, ns = m(p, s, [dem, img, msk], train=True)
    assert out.dtype == jnp.float32

    # BN running stats must stay fp32
    for leaf in jax.tree_util.tree_leaves(ns):
        assert leaf.dtype == jnp.float32

    grads = jax.grad(lambda q: jnp.sum(m(q, s, [dem, img, msk],
                                         train=True)[0]))(p)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(l.dtype == jnp.float32 for l in leaves)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)


def test_bf16_body_close_to_fp32(inputs):
    """Smooth input, shallow net: bf16 body must track fp32 closely (the
    DEM path and the deformable sampling never leave fp32)."""
    dem, img, msk = inputs
    kw = dict(num_feature=16, layers=(1, 1, 1, 1))
    m32 = JSPSR({"lr_dem": 1, "image": 3, "mask": 15}, **kw)
    mbf = JSPSR({"lr_dem": 1, "image": 3, "mask": 15},
                compute_dtype="bfloat16", **kw)
    p, s = m32.init(jax.random.PRNGKey(0))
    y32, _ = m32(p, s, [dem, img, msk], train=False)
    ybf, _ = mbf(p, s, [dem, img, msk], train=False)
    # the output is dominated by the fp32 residual DEM term; bf16 feature
    # noise enters only through affinities/offsets
    assert float(jnp.max(jnp.abs(y32 - ybf))) < 0.1
    assert float(jnp.mean(jnp.abs(y32 - ybf))) < 0.02


def test_bf16_grad_flows_nonzero(inputs):
    dem, img, msk = inputs
    m = JSPSR({"lr_dem": 1, "image": 3, "mask": 15}, num_feature=16,
              layers=(1, 1, 1, 1), compute_dtype="bfloat16")
    p, s = m.init(jax.random.PRNGKey(0))
    grads = jax.grad(lambda q: jnp.sum(jnp.square(
        m(q, s, [dem, img, msk], train=True)[0])))(p)
    # every stem + every stage must receive signal
    for name in ("conv_dem", "conv_img", "conv_aux", "layer1_dem",
                 "layer4_aux", "conv0", "generator"):
        sub = jax.tree_util.tree_leaves(grads[name])
        assert any(float(jnp.max(jnp.abs(l))) > 0 for l in sub), name
