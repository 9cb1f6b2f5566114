"""NN layer golden tests against torch (CPU) oracles.

torch here is only an oracle for semantics (padding arithmetic, BatchNorm
statistics, transposed-conv geometry) — the framework itself never uses it.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from jspsr_tpu import nn


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _to_hwio(w_oihw):
    return np.transpose(w_oihw, (2, 3, 1, 0))


@pytest.mark.parametrize("stride,pad,k", [(1, 1, 3), (2, 1, 3), (1, 2, 5), (2, 0, 1)])
def test_conv2d_matches_torch(stride, pad, k):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 4, 16, 16)).astype(np.float32)  # NCHW for torch
    tconv = torch.nn.Conv2d(4, 6, k, stride=stride, padding=pad, bias=True)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()

    conv = nn.Conv2d(4, 6, k, stride=stride, padding=pad, bias=True)
    params = {
        "w": jnp.asarray(_to_hwio(tconv.weight.detach().numpy())),
        "b": jnp.asarray(tconv.bias.detach().numpy()),
    }
    y, _ = conv(params, {}, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(
        np.transpose(np.asarray(y), (0, 3, 1, 2)), ref, rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("stride,pad,op,k", [(2, 1, 1, 3), (2, 0, 0, 2), (3, 1, 2, 3)])
def test_conv_transpose2d_matches_torch(stride, pad, op, k):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 5, 8, 8)).astype(np.float32)
    tconv = torch.nn.ConvTranspose2d(
        5, 3, k, stride=stride, padding=pad, output_padding=op, bias=True
    )
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()

    conv = nn.ConvTranspose2d(
        5, 3, k, stride=stride, padding=pad, output_padding=op, bias=True
    )
    # torch weight (cin, cout, kh, kw) -> equivalent fwd-conv HWIO: flip spatial,
    # then (kh, kw, cin, cout)
    wt = tconv.weight.detach().numpy()
    w = np.flip(wt, axis=(2, 3)).transpose(2, 3, 0, 1).copy()
    params = {"w": jnp.asarray(w), "b": jnp.asarray(tconv.bias.detach().numpy())}
    y, _ = conv(params, {}, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(
        np.transpose(np.asarray(y), (0, 3, 1, 2)), ref, rtol=1e-4, atol=1e-5
    )


def test_batchnorm_train_and_eval_match_torch():
    rng = np.random.default_rng(2)
    x1 = rng.normal(size=(4, 3, 8, 8)).astype(np.float32)
    x2 = rng.normal(size=(4, 3, 8, 8)).astype(np.float32)

    tbn = torch.nn.BatchNorm2d(3)
    tbn.train()
    with torch.no_grad():
        r1 = tbn(torch.from_numpy(x1)).numpy()
        r2 = tbn(torch.from_numpy(x2)).numpy()
    tbn.eval()
    with torch.no_grad():
        r3 = tbn(torch.from_numpy(x1)).numpy()

    bn = nn.BatchNorm2d(3)
    params, state = bn.init(jax.random.PRNGKey(0))
    y1, state = bn(params, state, jnp.asarray(np.transpose(x1, (0, 2, 3, 1))), train=True)
    np.testing.assert_allclose(np.transpose(np.asarray(y1), (0, 3, 1, 2)), r1, rtol=1e-4, atol=1e-5)
    y2, state = bn(params, state, jnp.asarray(np.transpose(x2, (0, 2, 3, 1))), train=True)
    np.testing.assert_allclose(np.transpose(np.asarray(y2), (0, 3, 1, 2)), r2, rtol=1e-4, atol=1e-5)
    # eval with accumulated running stats
    y3, _ = bn(params, state, jnp.asarray(np.transpose(x1, (0, 2, 3, 1))), train=False)
    np.testing.assert_allclose(
        np.transpose(np.asarray(y3), (0, 3, 1, 2)), r3, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(state["mean"]), tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(state["var"]), tbn.running_var.numpy(), rtol=1e-5, atol=1e-6
    )


def test_pixel_shuffle_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 12, 4, 4)).astype(np.float32)
    ref = torch.nn.functional.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    y = nn.pixel_shuffle(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), 2)
    np.testing.assert_allclose(np.transpose(np.asarray(y), (0, 3, 1, 2)), ref, rtol=1e-6, atol=1e-6)


def test_bicubic_resize_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 1, 16, 16)).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(32, 32), mode="bicubic", align_corners=False
    ).numpy()
    y = nn.bicubic_resize(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), 32, 32)
    np.testing.assert_allclose(
        np.transpose(np.asarray(y), (0, 3, 1, 2)), ref, rtol=1e-3, atol=1e-4
    )


def test_sequential_and_init_shapes():
    seq = nn.Sequential(
        nn.Conv2d(3, 8, 3, padding=1), nn.BatchNorm2d(8), nn.ReLU(),
        nn.Conv2d(8, 4, 1),
    )
    params, state = seq.init(jax.random.PRNGKey(0))
    assert set(params.keys()) == {"0", "1", "3"}
    assert set(state.keys()) == {"1"}
    x = jnp.zeros((2, 8, 8, 3))
    y, new_state = seq(params, state, x, train=True)
    assert y.shape == (2, 8, 8, 4)
    assert "1" in new_state


def test_global_pools():
    x = jnp.arange(2 * 3 * 4 * 5, dtype=jnp.float32).reshape(2, 3, 4, 5)
    assert nn.global_avg_pool(x).shape == (2, 1, 1, 5)
    assert nn.global_max_pool(x).shape == (2, 1, 1, 5)
    np.testing.assert_allclose(
        np.asarray(nn.global_max_pool(x))[0, 0, 0], np.asarray(x[0].max(axis=(0, 1)))
    )


def test_conv2d_s2d_lowering_exact():
    """The space-to-depth lowering of stride-2 3x3 convs (PERF.md backward
    efficiency fix) computes the identical function and gradients."""
    import jax
    from jspsr_tpu.nn import layers as L

    conv = L.Conv2d(6, 8, 3, stride=2, padding=1, bias=True)
    params, _ = conv.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(2, 16, 12, 6)).astype(np.float32))

    def run(x, params):
        y, _ = conv(params, {}, x)
        return y

    L.set_s2d_stride2(False)
    try:
        ref = run(x, params)
        g_ref = jax.grad(lambda x, p: jnp.sum(jnp.tanh(run(x, p))),
                         argnums=(0, 1))(x, params)
        L.set_s2d_stride2(True)
        got = run(x, params)
        g_got = jax.grad(lambda x, p: jnp.sum(jnp.tanh(run(x, p))),
                         argnums=(0, 1))(x, params)
    finally:
        L.set_s2d_stride2("auto")

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_got),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    # odd spatial size falls back to the strided lowering (shape guard)
    x_odd = x[:, :15]
    L.set_s2d_stride2(True)
    try:
        y_odd, _ = conv(params, {}, x_odd)
    finally:
        L.set_s2d_stride2("auto")
    assert y_odd.shape == (2, 8, 6, 8)


def test_conv2d_s1_custom_vjp_exact():
    """The manual-dgrad VJP for stride-1 3x3 'same' convs (the dgrad is
    re-expressed as a plain forward conv with the kernel rotated 180 and
    I/O swapped; PERF.md backward section) computes the identical function
    and gradients, including non-square channels and under jax.checkpoint."""
    import jax
    from jspsr_tpu.nn import layers as L

    for cin, cout, k in ((6, 6, 3), (6, 10, 3), (4, 7, 5)):
        conv = L.Conv2d(cin, cout, k, stride=1, padding=k // 2, bias=True)
        params, _ = conv.init(jax.random.PRNGKey(1))
        x = jnp.asarray(np.random.default_rng(1)
                        .normal(size=(2, 12, 16, cin)).astype(np.float32))

        def run(x, params):
            y, _ = conv(params, {}, x)
            return y

        L.set_conv_s1_custom_vjp(False)
        try:
            ref = run(x, params)
            g_ref = jax.grad(lambda x, p: jnp.sum(jnp.tanh(run(x, p))),
                             argnums=(0, 1))(x, params)
            L.set_conv_s1_custom_vjp(True)
            got = run(x, params)
            g_got = jax.grad(lambda x, p: jnp.sum(jnp.tanh(run(x, p))),
                             argnums=(0, 1))(x, params)
            g_ckpt = jax.grad(
                jax.checkpoint(lambda x, p: jnp.sum(jnp.tanh(run(x, p)))),
                argnums=(0, 1))(x, params)
            L.set_conv_s1_wgrad_dot(True)
            g_dot = jax.grad(lambda x, p: jnp.sum(jnp.tanh(run(x, p))),
                             argnums=(0, 1))(x, params)
        finally:
            L.set_conv_s1_custom_vjp(False)
            L.set_conv_s1_wgrad_dot(False)

        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        # g_dot's weight grad reassociates the B*H*W reduction (im2col dot
        # vs conv-form wgrad) — fp32 tolerance covers the reorder only
        for variant, tol in ((g_got, 1e-5), (g_ckpt, 1e-5), (g_dot, 1e-4)):
            for a, b in zip(jax.tree_util.tree_leaves(variant),
                            jax.tree_util.tree_leaves(g_ref)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=tol, atol=tol)


def test_conv2d_s1_custom_vjp_max_ch_gate():
    """set_conv_s1_custom_vjp(mode, max_ch=N) restricts the manual-dgrad
    wrap to convs with max(Cin, Cout) <= N (the narrow shapes where XLA's
    dgrad lowering was the measured outlier; PERF.md)."""
    from jspsr_tpu.nn import layers as L

    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(1, 8, 8, 6)).astype(np.float32))

    def jaxpr_wraps(cin, cout):
        conv = L.Conv2d(cin, cout, 3, stride=1, padding=1, bias=False)
        params, _ = conv.init(jax.random.PRNGKey(0))
        xx = x[..., :cin] if cin <= 6 else jnp.tile(x, (1, 1, 1, 2))[..., :cin]
        jaxpr = jax.make_jaxpr(lambda a: conv(params, {}, a)[0])(xx)
        return "custom_vjp_call" in str(jaxpr)

    try:
        L.set_conv_s1_custom_vjp(True, max_ch=6)
        assert jaxpr_wraps(6, 6)
        assert not jaxpr_wraps(6, 10)  # cout exceeds the cap
        L.set_conv_s1_custom_vjp(True)  # no cap: wraps everything
        assert jaxpr_wraps(6, 10)
        L.set_conv_s1_custom_vjp(False)
        assert not jaxpr_wraps(6, 6)
    finally:
        L.set_conv_s1_custom_vjp(False)
