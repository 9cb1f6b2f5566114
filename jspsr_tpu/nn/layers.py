"""Core NN layers: NHWC convs on the MXU, explicit-state BatchNorm.

All tensors are NHWC (TPU-native layout). Conv weights are HWIO.
Semantics (padding arithmetic, BatchNorm statistics, transposed-conv output
size) match torch's so that reference checkpoints can be imported and
verified; the implementations are XLA-first (`lax.conv_general_dilated`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from jspsr_tpu.nn import initializers as inits
from jspsr_tpu.nn.module import Module

_DIMS = ("NHWC", "HWIO", "NHWC")


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


# Space-to-depth lowering of stride-2 3x3 'same' convs: the same function
# expressed as a dense stride-1 2x2 conv over 4C channels (exact arithmetic,
# verified in tests). Measured on v5e at (16, 64^2, 128->256): forward 1.2x
# FASTER than the strided lowering, data-gradient ~6% slower — XLA's TPU
# backend already handles the zero-stuffed dgrad well, so this stays an
# opt-in lever (set_s2d_stride2(True) / "auto" enables it on non-CPU
# backends) rather than the default. Kept because the forward win matters
# for inference-heavy deployments.
_S2D_STRIDE2 = False

# Custom-VJP lowering of stride-1 odd-k 'same' convs: the data gradient of
# such a conv is EXACTLY another stride-1 'same' conv with the kernel
# rotated 180 degrees and I/O swapped. XLA's autodiff dgrad for these
# shapes measured 1.8x its padded SOL at 64 channels in ISOLATION (49
# TFLOP/s vs the forward's 132, scripts/bench_bwd_dirs.py), which motivated
# re-expressing the backward as a plain forward conv. The step-level A/B
# (scripts/bench_conv_vjp_step.py, v5e) showed the isolation win does NOT
# transfer to the fused program: flagship train step fp32 b16 0.973x
# (89.74 -> 92.22 ms) and bf16 b48 0.997x — defining custom_vjp boundaries
# around every conv blocks XLA's cross-op fusion and costs more than the
# dgrad lowering saved. Default OFF everywhere; kept as an opt-in probe
# lever. Exact-arithmetic equality with autodiff is tested
# (tests/test_nn_layers.py), mesh/halo + train-trace equality in
# tests/test_train.py.
#
# max_ch refinement: the dgrad outlier is confined to NARROW convs (the
# wide shapes already run at 0.96-1.3x SOL), so wrapping wide convs pays
# the fusion-boundary tax for zero dgrad win. set_conv_s1_custom_vjp's
# max_ch arg restricts the wrap to convs with max(Cin, Cout) <= max_ch.
_CONV_S1_CUSTOM_VJP = False
_CONV_S1_VJP_MAX_CH = None


def set_conv_s1_custom_vjp(mode, max_ch=None):
    """Toggle the manual-dgrad VJP for stride-1 odd-k 'same' convs.

    True/False force it; "auto" enables it on non-CPU backends.
    max_ch (optional int) restricts it to convs whose max(Cin, Cout)
    <= max_ch — the narrow shapes where XLA's dgrad lowering is the
    measured outlier."""
    global _CONV_S1_CUSTOM_VJP, _CONV_S1_VJP_MAX_CH
    _CONV_S1_CUSTOM_VJP = mode
    _CONV_S1_VJP_MAX_CH = max_ch


def _conv_s1_vjp_enabled() -> bool:
    if _CONV_S1_CUSTOM_VJP == "auto":
        return jax.default_backend() not in ("cpu",)
    return bool(_CONV_S1_CUSTOM_VJP)


def _conv_s1_vjp_wraps(cin: int, cout: int) -> bool:
    if not _conv_s1_vjp_enabled():
        return False
    if _CONV_S1_VJP_MAX_CH is None:
        return True
    return max(cin, cout) <= _CONV_S1_VJP_MAX_CH


def _same_pads(w):
    kh, kw = w.shape[0], w.shape[1]
    return ((kh // 2, kh // 2), (kw // 2, kw // 2))


# Optional wgrad re-expression for conv2d_s1_same: one dot_general over
# im2col patches (contract B*H*W — an MXU-shaped reduction) instead of
# XLA's conv-form wgrad, which measured 1.53x its padded SOL at the SPN
# generator's 128-ch full-res shape (scripts/bench_bwd_dirs.py). Gated
# separately from the dgrad flip because it materializes the 9 shifted
# views of x; the probe (scripts/bench_dgrad_manual.py wg_dot) decides.
_CONV_S1_WGRAD_DOT = False


def set_conv_s1_wgrad_dot(on: bool):
    global _CONV_S1_WGRAD_DOT
    _CONV_S1_WGRAD_DOT = on


def _wgrad_dot(x, dy, kh, kw):
    """dw[kh,kw,i,o] = sum_bhw xpad[b,h+kh,w+kw,i] * dy[b,h,w,o]."""
    b, h, w, cin = x.shape
    cout = dy.shape[-1]
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    cols = [xp[:, i:i + h, j:j + w, :]
            for i in range(kh) for j in range(kw)]
    pat = jnp.stack(cols, 0).reshape(kh * kw, b * h * w, cin)
    gfl = dy.reshape(b * h * w, cout)
    dw = lax.dot_general(pat, gfl, (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    return dw.reshape(kh, kw, cin, cout).astype(dy.dtype)


@jax.custom_vjp
def conv2d_s1_same(x, w):
    """Stride-1 odd-k 'same' conv with a manual-dgrad backward (see above)."""
    return lax.conv_general_dilated(x, w, (1, 1), _same_pads(w),
                                    dimension_numbers=_DIMS)


def _conv_s1_fwd(x, w):
    return conv2d_s1_same(x, w), (x, w)


def _conv_s1_bwd(res, dy):
    x, w = res
    # dx: rot180 + swap I/O, then a plain forward conv over the cotangent
    wf = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)
    dx = lax.conv_general_dilated(dy, wf, (1, 1), _same_pads(w),
                                  dimension_numbers=_DIMS)
    # dw: XLA's wgrad lowering by default (the unused primal is DCE'd under
    # jit); optionally the im2col dot_general form (see _CONV_S1_WGRAD_DOT)
    if _CONV_S1_WGRAD_DOT:
        dw = _wgrad_dot(x, dy, w.shape[0], w.shape[1]).astype(w.dtype)
    else:
        _, vjp_w = jax.vjp(
            lambda ww: lax.conv_general_dilated(x, ww, (1, 1), _same_pads(w),
                                                dimension_numbers=_DIMS), w)
        (dw,) = vjp_w(dy)
    return dx, dw


conv2d_s1_same.defvjp(_conv_s1_fwd, _conv_s1_bwd)


# Single-pass BatchNorm batch statistics (E[x^2]-E[x]^2, fp32 accumulation).
# Default ON: measured on v5e at b16 128^2 it takes the flagship train step
# 98.0 -> 90.8 ms fp32 and 60.8 -> 57.7 ms bf16 (both reductions read the
# activation once via sibling fusion instead of a second centered pass).
# torch-parity holds to the tested tolerances (fp32 accumulation; the
# cancellation error is ~eps*(1+mean^2/var) with O(1) activations).
_BN_SINGLE_PASS = True


def set_bn_single_pass(on: bool):
    global _BN_SINGLE_PASS
    _BN_SINGLE_PASS = bool(on)


def set_s2d_stride2(mode):
    """Toggle the space-to-depth lowering of stride-2 3x3 convs.

    True/False force it; "auto" enables it on non-CPU backends."""
    global _S2D_STRIDE2
    _S2D_STRIDE2 = mode


def _s2d_enabled() -> bool:
    if _S2D_STRIDE2 == "auto":
        return jax.default_backend() not in ("cpu",)
    return bool(_S2D_STRIDE2)


def conv2d_s2_std(x, w):
    """Stride-2 3x3 'same' conv via space-to-depth (numerically exact).

    y[i,j] = sum_{e,f in {-1,0,1}} x[2i+e, 2j+f] w[e+1, f+1]. Writing
    x as X[I, (r, c)] = x[2I+r] gives a 2x2 stride-1 conv over 4C channels
    whose kernel is the 3x3 kernel zero-padded to 4x4 at the front and
    regrouped by (block, phase); the original 'same' padding becomes a
    single top-left zero pad in s2d space. Verified equal to the strided
    lowering in tests and on device (scripts/bench_s2d_probe.py).
    """
    b, h, w_, c = x.shape
    _, _, _, o = w.shape
    xs = x.reshape(b, h // 2, 2, w_ // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(b, h // 2, w_ // 2, 4 * c)
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
    w2 = wp.reshape(2, 2, 2, 2, c, o).transpose(0, 2, 1, 3, 4, 5)
    w2 = w2.reshape(2, 2, 4 * c, o)
    return lax.conv_general_dilated(xs, w2, (1, 1), ((1, 0), (1, 0)),
                                    dimension_numbers=_DIMS)


class Conv2d(Module):
    """2D convolution, NHWC x HWIO -> NHWC.

    torch-compatible integer padding: pad p on both sides of H and W.
    """

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size,
        stride=1,
        padding=0,
        bias: bool = True,
        groups: int = 1,
        weight_init=None,
        dtype=jnp.float32,
    ):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = _pair(kernel_size)
        self.stride = _pair(stride)
        self.padding = _pair(padding)
        self.use_bias = bias
        self.groups = groups
        self.weight_init = weight_init or inits.trunc_normal_fan_in()
        self.dtype = dtype

    def init(self, rng):
        kh, kw = self.kernel_size
        kw_key, b_key = jax.random.split(rng)
        w = self.weight_init(
            kw_key, (kh, kw, self.in_channels // self.groups, self.out_channels),
            self.dtype,
        )
        params = {"w": w}
        if self.use_bias:
            params["b"] = jnp.zeros((self.out_channels,), self.dtype)
        return params, {}

    def __call__(self, params, state, x, train: bool = False):
        ph, pw = self.padding
        w = params["w"].astype(x.dtype)
        if (self.stride == (2, 2) and self.kernel_size == (3, 3)
                and (ph, pw) == (1, 1) and self.groups == 1
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
                and _s2d_enabled()):
            y = conv2d_s2_std(x, w)
        elif (self.stride == (1, 1) and self.groups == 1
                and self.kernel_size[0] % 2 == 1 and self.kernel_size[0] > 1
                and self.kernel_size[0] == self.kernel_size[1]
                and (ph, pw) == (self.kernel_size[0] // 2,) * 2
                and _conv_s1_vjp_wraps(self.in_channels, self.out_channels)):
            y = conv2d_s1_same(x, w)
        else:
            y = lax.conv_general_dilated(
                x,
                w,
                window_strides=self.stride,
                padding=((ph, ph), (pw, pw)),
                dimension_numbers=_DIMS,
                feature_group_count=self.groups,
            )
        if self.use_bias:
            y = y + params["b"].astype(y.dtype)
        return y, {}


class ConvTranspose2d(Module):
    """Transposed 2D convolution with torch output-size semantics.

    out = (in - 1)*stride - 2*padding + kernel + output_padding

    Implemented as an input-dilated forward convolution (lhs_dilation), which
    XLA lowers to an MXU-friendly conv. The stored weight is the HWIO kernel
    of that equivalent forward conv (the torch importer flips/permutes).
    """

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size,
        stride=2,
        padding=1,
        output_padding=1,
        bias: bool = True,
        weight_init=None,
        dtype=jnp.float32,
    ):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = _pair(kernel_size)
        self.stride = _pair(stride)
        self.padding = _pair(padding)
        self.output_padding = _pair(output_padding)
        self.use_bias = bias
        self.weight_init = weight_init or inits.trunc_normal_fan_in()
        self.dtype = dtype

    def init(self, rng):
        kh, kw = self.kernel_size
        kw_key, _ = jax.random.split(rng)
        w = self.weight_init(
            kw_key, (kh, kw, self.in_channels, self.out_channels), self.dtype
        )
        params = {"w": w}
        if self.use_bias:
            params["b"] = jnp.zeros((self.out_channels,), self.dtype)
        return params, {}

    def __call__(self, params, state, x, train: bool = False):
        (kh, kw) = self.kernel_size
        (sh, sw) = self.stride
        (ph, pw) = self.padding
        (oph, opw) = self.output_padding
        y = lax.conv_general_dilated(
            x,
            params["w"].astype(x.dtype),
            window_strides=(1, 1),
            padding=((kh - 1 - ph, kh - 1 - ph + oph), (kw - 1 - pw, kw - 1 - pw + opw)),
            lhs_dilation=(sh, sw),
            dimension_numbers=_DIMS,
        )
        if self.use_bias:
            y = y + params["b"].astype(y.dtype)
        return y, {}


class BatchNorm2d(Module):
    """BatchNorm over NHWC with explicit running-stats state.

    torch semantics: training normalizes with biased batch variance and
    updates running stats as (1-m)*running + m*batch (unbiased variance for
    the running update); eval normalizes with running stats.
    """

    def __init__(self, num_features: int, eps: float = 1e-5, momentum: float = 0.1):
        super().__init__()
        self.num_features = num_features
        self.eps = eps
        self.momentum = momentum

    def init(self, rng):
        params = {
            "scale": jnp.ones((self.num_features,), jnp.float32),
            "bias": jnp.zeros((self.num_features,), jnp.float32),
        }
        state = {
            "mean": jnp.zeros((self.num_features,), jnp.float32),
            "var": jnp.ones((self.num_features,), jnp.float32),
        }
        return params, state

    def __call__(self, params, state, x, train: bool = False):
        if train:
            xf = x.astype(jnp.float32)
            if _BN_SINGLE_PASS:
                # E[x^2]-E[x]^2 in fp32: both reductions read x once
                # (sibling fusion) instead of the second pass the centered
                # form needs after mean materializes. Safe here: fp32
                # accumulation and O(1)-magnitude activations keep the
                # cancellation error ~eps*(1+mean^2/var), torch-parity
                # tested.
                mean = jnp.mean(xf, axis=(0, 1, 2))
                ex2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
                var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
            else:
                mean = jnp.mean(xf, axis=(0, 1, 2))
                var = jnp.mean(jnp.square(xf - mean), axis=(0, 1, 2))
            n = x.shape[0] * x.shape[1] * x.shape[2]
            unbiased = var * (n / max(n - 1, 1))
            m = self.momentum
            new_state = {
                "mean": (1 - m) * state["mean"] + m * mean,
                "var": (1 - m) * state["var"] + m * unbiased,
            }
        else:
            mean, var = state["mean"], state["var"]
            new_state = {}
        inv = lax.rsqrt(var + self.eps) * params["scale"]
        y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype) + params["bias"].astype(
            x.dtype
        )
        return y, new_state


class Dense(Module):
    """Linear layer on the last axis (torch nn.Linear semantics).

    Stored weight is (in, out); torch stores (out, in) — importer transposes.
    """

    def __init__(self, in_features: int, out_features: int, bias: bool = True,
                 weight_init=None):
        super().__init__()
        self.in_features = in_features
        self.out_features = out_features
        self.use_bias = bias
        self.weight_init = weight_init

    def init(self, rng):
        k1, _ = jax.random.split(rng)
        if self.weight_init is not None:
            w = self.weight_init(k1, (self.in_features, self.out_features))
        else:
            # timm trunc_normal_(std=0.02) is effectively normal at that std
            w = jax.random.normal(
                k1, (self.in_features, self.out_features), jnp.float32
            ) * 0.02
        params = {"w": w}
        if self.use_bias:
            params["b"] = jnp.zeros((self.out_features,), jnp.float32)
        return params, {}

    def __call__(self, params, state, x, train: bool = False):
        y = x @ params["w"].astype(x.dtype)
        if self.use_bias:
            y = y + params["b"].astype(y.dtype)
        return y, {}


class LayerNorm(Module):
    """LayerNorm over the last axis (torch semantics, biased variance)."""

    def __init__(self, num_features: int, eps: float = 1e-5):
        super().__init__()
        self.num_features = num_features
        self.eps = eps

    def init(self, rng):
        return {"scale": jnp.ones((self.num_features,), jnp.float32),
                "bias": jnp.zeros((self.num_features,), jnp.float32)}, {}

    def __call__(self, params, state, x, train: bool = False):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * lax.rsqrt(var + self.eps)
        return y * params["scale"] + params["bias"], {}


class ReLU(Module):
    def init(self, rng):
        return {}, {}

    def __call__(self, params, state, x, train: bool = False):
        return jnp.maximum(x, 0), {}


class LeakyReLU(Module):
    def __init__(self, negative_slope: float = 0.2):
        super().__init__()
        self.negative_slope = negative_slope

    def init(self, rng):
        return {}, {}

    def __call__(self, params, state, x, train: bool = False):
        return jnp.where(x >= 0, x, x * self.negative_slope), {}


class Sigmoid(Module):
    def init(self, rng):
        return {}, {}

    def __call__(self, params, state, x, train: bool = False):
        return jax.nn.sigmoid(x), {}


def global_avg_pool(x):
    """NHWC -> (N,1,1,C) mean pool (AdaptiveAvgPool2d(1))."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)


def global_max_pool(x):
    """NHWC -> (N,1,1,C) max pool (AdaptiveMaxPool2d(1))."""
    return jnp.max(x, axis=(1, 2), keepdims=True)


def pixel_shuffle(x, r: int):
    """NHWC pixel shuffle with torch channel-order semantics.

    out[b, h*r+i, w*r+j, c] = in[b, h, w, c*r*r + i*r + j]
    """
    b, h, w, c = x.shape
    assert c % (r * r) == 0
    cout = c // (r * r)
    x = x.reshape(b, h, w, cout, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, cout)


def _cubic_kernel(x, a: float):
    import numpy as np

    ax = np.abs(x)
    w = np.where(
        ax <= 1,
        (a + 2) * ax**3 - (a + 3) * ax**2 + 1,
        np.where(ax < 2, a * ax**3 - 5 * a * ax**2 + 8 * a * ax - 4 * a, 0.0),
    )
    return w


def _resize_matrix(in_size: int, out_size: int, mode: str):
    """Dense (out, in) interpolation matrix, half-pixel centers, clamped borders.

    Resizing as a matmul maps naturally onto the MXU; the matrix is a
    trace-time constant (static shapes).
    """
    import numpy as np

    scale = in_size / out_size
    src = (np.arange(out_size) + 0.5) * scale - 0.5
    if mode == "bicubic":
        taps, a = 4, -0.75
        i0 = np.floor(src).astype(np.int64) - 1
        offs = np.arange(taps)
        idx = i0[:, None] + offs[None, :]
        w = _cubic_kernel(src[:, None] - idx, a)
    elif mode == "bilinear":
        taps = 2
        i0 = np.floor(src).astype(np.int64)
        offs = np.arange(taps)
        idx = i0[:, None] + offs[None, :]
        w = np.maximum(0.0, 1.0 - np.abs(src[:, None] - idx))
    else:
        raise ValueError(mode)
    idx = np.clip(idx, 0, in_size - 1)
    mat = np.zeros((out_size, in_size), np.float32)
    np.add.at(mat, (np.repeat(np.arange(out_size), taps), idx.ravel()), w.ravel())
    return jnp.asarray(mat)


def _resize_matrix_ac(in_size: int, out_size: int):
    """align_corners=True bilinear interpolation matrix."""
    import numpy as np

    if out_size == 1:
        src = np.zeros((1,))
    else:
        src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    i0 = np.clip(np.floor(src).astype(np.int64), 0, max(in_size - 2, 0))
    t = src - i0
    mat = np.zeros((out_size, in_size), np.float32)
    mat[np.arange(out_size), i0] += 1 - t
    mat[np.arange(out_size), np.minimum(i0 + 1, in_size - 1)] += t
    return jnp.asarray(mat)


def _matmul_resize(x, out_h: int, out_w: int, mode: str):
    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    if mode == "bilinear_ac":
        ah = _resize_matrix_ac(h, out_h)
        aw = _resize_matrix_ac(w, out_w)
    else:
        ah = _resize_matrix(h, out_h, mode)
        aw = _resize_matrix(w, out_w, mode)
    y = jnp.einsum("Oh,bhwc->bOwc", ah, x, precision=lax.Precision.HIGHEST)
    y = jnp.einsum("Ow,bhwc->bhOc", aw, y, precision=lax.Precision.HIGHEST)
    return y


def bilinear_resize(x, out_h: int, out_w: int, align_corners: bool = False):
    """Bilinear resize NHWC matching torch F.interpolate(mode='bilinear')."""
    return _matmul_resize(x, out_h, out_w,
                          "bilinear_ac" if align_corners else "bilinear")


def bicubic_resize(x, out_h: int, out_w: int):
    """Bicubic resize NHWC matching torch F.interpolate(mode='bicubic',
    align_corners=False): a=-0.75 Keys kernel, half-pixel centers."""
    return _matmul_resize(x, out_h, out_w, "bicubic")
