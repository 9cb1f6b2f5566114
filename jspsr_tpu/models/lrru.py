"""LRRU baseline (reference models/LRRU.py): long-range recurrent-update
guided depth/DEM completion.

Dual img/dem ("lidar") encoder with stochastic-depth BasicBlocks (survival
probability annealed linearly across blocks, LRRU.py:125-185,325-329),
5 stages; decoder runs 4 iterative refinement rounds, each predicting
affinity/offsets from the PREVIOUS output (detached between rounds,
LRRU.py:453,467,481,496) and applying the shared modulated deformable
post-process.

Stochastic depth: at eval, out = prob * block(x) + identity (multFlag);
at train, the whole block is kept/dropped by a Bernoulli draw — pass
``rng`` to __call__ for that (omitted -> deterministic keep, which is the
identity in expectation at prob=1 as shipped: args.prob=1.0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jspsr_tpu import nn
from jspsr_tpu.nn.module import Module, Sequential
from jspsr_tpu.ops.deform_conv import deform_conv2d, insert_zero_center_offset


def conv1x1(cin, cout, stride=1):
    return nn.Conv2d(cin, cout, 1, stride=stride, padding=0, bias=False)


def conv3x3(cin, cout, stride=1):
    return nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)


class LBasic2d(Module):
    """LRRU Basic2d: conv [+BN] + ReLU (always ReLU; bias iff no BN)."""

    def __init__(self, cin, cout, bn: bool = True, kernel_size=3, padding=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, kernel_size, padding=padding,
                              bias=not bn)
        self.bn = nn.BatchNorm2d(cout) if bn else None

    def __call__(self, params, state, x, train: bool = False):
        ns = {}
        x, _ = self.conv(params["conv"], {}, x)
        if self.bn is not None:
            x, s = self.bn(params["bn"], state["bn"], x, train=train)
            if s:
                ns["bn"] = s
        return jnp.maximum(x, 0), ns


class LBasic2dTrans(Module):
    """LRRU Basic2dTrans: ConvTranspose(k3 s2 op1, no bias) + BN + ReLU."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.ConvTranspose2d(cin, cout, 3, 2, 1, 1, bias=False)
        self.bn = nn.BatchNorm2d(cout)

    def __call__(self, params, state, x, train: bool = False):
        x, _ = self.conv(params["conv"], {}, x)
        x, s = self.bn(params["bn"], state["bn"], x, train=train)
        return jnp.maximum(x, 0), ({"bn": s} if s else {})


class LDownsample(Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv = conv1x1(cin, cout, stride)
        self.bn = nn.BatchNorm2d(cout)

    def __call__(self, params, state, x, train: bool = False):
        x, _ = self.conv(params["conv"], {}, x)
        x, s = self.bn(params["bn"], state["bn"], x, train=train)
        return x, ({"bn": s} if s else {})


class LBasicBlock(Module):
    """Plain BasicBlock (no res scale), optional post-activation."""

    def __init__(self, cin, planes, stride=1, downsample=None, act=True):
        super().__init__()
        self.conv1 = conv3x3(cin, planes, stride)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = conv3x3(planes, planes)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample
        self.act = act

    def __call__(self, params, state, x, train: bool = False):
        ns = {}
        idt = x
        out, _ = self.conv1(params["conv1"], {}, x)
        out, s = self.bn1(params["bn1"], state["bn1"], out, train=train)
        if s:
            ns["bn1"] = s
        out = jnp.maximum(out, 0)
        out, _ = self.conv2(params["conv2"], {}, out)
        out, s = self.bn2(params["bn2"], state["bn2"], out, train=train)
        if s:
            ns["bn2"] = s
        if self.downsample is not None:
            idt, s = self.downsample(params["downsample"],
                                     state.get("downsample", {}), x, train=train)
            if s:
                ns["downsample"] = s
        out = out + idt
        if self.act:
            out = jnp.maximum(out, 0)
        return out, ns


class StoDepthBlock(Module):
    """Stochastic-depth BasicBlock (reference LRRU.py:125-185)."""

    def __init__(self, prob, mult_flag, cin, planes, stride=1, downsample=None):
        super().__init__()
        self.prob = float(prob)
        self.mult_flag = mult_flag
        self.conv1 = conv3x3(cin, planes, stride)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = conv3x3(planes, planes)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def __call__(self, params, state, x, train: bool = False, rng=None):
        ns = {}
        idt = x
        if self.downsample is not None:
            idt, s = self.downsample(params["downsample"],
                                     state.get("downsample", {}), x, train=train)
            if s:
                ns["downsample"] = s

        def body(x):
            sub = {}
            out, _ = self.conv1(params["conv1"], {}, x)
            out, s = self.bn1(params["bn1"], state["bn1"], out, train=train)
            if s:
                sub["bn1"] = s
            out = jnp.maximum(out, 0)
            out, _ = self.conv2(params["conv2"], {}, out)
            out, s = self.bn2(params["bn2"], state["bn2"], out, train=train)
            if s:
                sub["bn2"] = s
            return out, sub

        if train:
            out, sub = body(x)
            ns.update(sub)
            if rng is not None and self.prob < 1.0:
                keep = jax.random.bernoulli(rng, self.prob).astype(x.dtype)
                out = keep * out + idt
            else:
                out = out + idt
        else:
            out, _ = body(x)
            out = (self.prob * out + idt) if self.mult_flag else (out + idt)
        return jnp.maximum(out, 0), ns


class LGuide(Module):
    """concat + Basic2d fusion (reference LRRU.py:187-201)."""

    def __init__(self, planes):
        super().__init__()
        self.conv = LBasic2d(planes * 2, planes, bn=True)

    def __call__(self, params, state, feat, weight, train: bool = False):
        x = jnp.concatenate([feat, weight], axis=-1)
        x, s = self.conv(params["conv"], state["conv"], x, train=train)
        return x, ({"conv": s} if s else {})


class BasicDepthEncoder(Module):
    """Per-round affinity/offset generator (reference LRRU.py:203-247)."""

    def __init__(self, kernel_size=3, bc=16):
        super().__init__()
        self.kernel_size = kernel_size
        self.num = kernel_size * kernel_size - 1
        self.convd1 = LBasic2d(1, bc * 2, bn=False)
        self.convd2 = LBasic2d(bc * 2, bc * 2, bn=False)
        self.convf1 = LBasic2d(bc * 2, bc * 2, bn=False)
        self.convf2 = LBasic2d(bc * 2, bc * 2, bn=False)
        self.conv = LBasic2d(bc * 4, bc * 4, bn=False)
        self.ref = LBasicBlock(bc * 4, bc * 4, act=False)
        self.conv_weight = nn.Conv2d(bc * 4, kernel_size**2, 1, padding=0)
        self.conv_offset = nn.Conv2d(bc * 4, 2 * self.num, 1, padding=0)

    def __call__(self, params, state, depth, context, train: bool = False):
        ns = {}
        d, _ = self.convd1(params["convd1"], {}, depth, train=train)
        d, _ = self.convd2(params["convd2"], {}, d, train=train)
        f, _ = self.convf1(params["convf1"], {}, context, train=train)
        f, _ = self.convf2(params["convf2"], {}, f, train=train)
        feat = jnp.concatenate([d, f], axis=-1)
        feat, _ = self.conv(params["conv"], {}, feat, train=train)
        feat, s = self.ref(params["ref"], state["ref"], feat, train=train)
        if s:
            ns["ref"] = s
        # Both 1x1 heads in ONE conv (exact: concatenated output channels
        # are independent rows of the same matmul) — the full-res bc*4
        # feature map is read once instead of twice, and LRRU pays this
        # read in EVERY of its 4 refinement rounds (the JSPSR generator's
        # measured head-merge, models/spn.py:56-71, applied here).
        # Param tree keeps the reference's separate conv_weight/conv_offset
        # modules (reference LRRU.py:231-238); the merge is trace-time.
        k2 = self.kernel_size ** 2
        w_cat = jnp.concatenate(
            [params["conv_weight"]["w"], params["conv_offset"]["w"]],
            axis=-1).astype(feat.dtype)
        b_cat = jnp.concatenate(
            [params["conv_weight"]["b"], params["conv_offset"]["b"]]
        ).astype(feat.dtype)
        heads = jax.lax.conv_general_dilated(
            feat, w_cat, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b_cat
        weight = jax.nn.sigmoid(heads[..., :k2])
        offset = insert_zero_center_offset(heads[..., k2:],
                                           self.kernel_size)
        return (weight, offset), ns


class PostProcess(Module):
    """Shared deformable post-process (reference LRRU.py:250-298)."""

    def __init__(self, kernel_size=3, dkn_residual=True):
        super().__init__()
        self.kernel_size = kernel_size
        self.dkn_residual = dkn_residual

    def init(self, rng):
        k = self.kernel_size
        return {"w": jnp.ones((k, k, 1, 1), jnp.float32),
                "b": jnp.zeros((1,), jnp.float32)}, {}

    def __call__(self, params, state, depth, weight, offset,
                 train: bool = False):
        if self.dkn_residual:
            weight = weight - jnp.mean(weight, axis=-1, keepdims=True)
        else:
            weight = weight / jnp.sum(weight, axis=-1, keepdims=True)
        # x_grad=False: every refinement round detaches its input depth
        # (reference LRRU.py:453,467,481,496)
        out = deform_conv2d(depth, offset, params["w"], params["b"], weight,
                            padding=(self.kernel_size - 1) // 2,
                            x_grad=False)
        if self.dkn_residual:
            out = out + depth
        return out, {}


class LRRU(Module):
    def __init__(self, in_channels: dict, out_channels: int = 1,
                 kernel_size: int = 3, bc: int = 16, prob: float = 1.0,
                 dkn_residual: bool = True, layers=(2, 2, 2, 2, 2),
                 mult_flag: bool = True, preserve_input: bool = True):
        super().__init__()
        self.name = "LRRU"
        assert "lr_dem" in in_channels and "image" in in_channels
        self.preserve_input = preserve_input
        ic = bc * 2  # 32

        # stochastic-depth survival prob annealed linearly over all blocks
        self._prob_now = 1.0
        self._prob_step = (1.0 - prob) / (sum(layers) - 1)
        self.mult_flag = mult_flag

        self.conv_img = LBasic2d(3, ic, bn=True, kernel_size=5, padding=2)
        self.conv_lidar = LBasic2d(1, ic, bn=False, kernel_size=5, padding=2)

        self.inplanes = ic
        chans = [ic * 2, ic * 4, ic * 8, ic * 8, ic * 8]
        strides = [1, 2, 2, 2, 2]
        for i in range(5):
            img_l, dep_l = self._make_layer(chans[i], layers[i], strides[i])
            setattr(self, f"layer{i + 1}_img", img_l)
            setattr(self, f"layer{i + 1}_lidar", dep_l)
            if i < 4:
                setattr(self, f"guide{i + 1}", LGuide(chans[i]))

        self.layer4d = LBasic2dTrans(ic * 8, ic * 8)
        self.upproj0 = Sequential(LBasic2dTrans(ic * 8, ic * 4),
                                  LBasic2dTrans(ic * 4, ic * 2),
                                  LBasic2dTrans(ic * 2, ic))
        self.weight_offset0 = BasicDepthEncoder(kernel_size, bc)
        self.layer3d = LBasic2dTrans(ic * 8, ic * 8)
        self.upproj1 = Sequential(LBasic2dTrans(ic * 8, ic * 4),
                                  LBasic2dTrans(ic * 4, ic))
        self.weight_offset1 = BasicDepthEncoder(kernel_size, bc)
        self.layer2d = LBasic2dTrans(ic * 8, ic * 4)
        self.upproj2 = Sequential(LBasic2dTrans(ic * 4, ic))
        self.weight_offset2 = BasicDepthEncoder(kernel_size, bc)
        self.layer1d = LBasic2dTrans(ic * 4, ic * 2)
        self.conv = LBasic2d(ic * 2, ic, bn=True)
        self.weight_offset3 = BasicDepthEncoder(kernel_size, bc)
        self.Post_process = PostProcess(kernel_size, dkn_residual)

    def _make_layer(self, planes, blocks, stride):
        img_ds = dep_ds = None
        if stride != 1 or self.inplanes != planes:
            img_ds = LDownsample(self.inplanes, planes, stride)
            dep_ds = LDownsample(self.inplanes, planes, stride)
        img_layers = [StoDepthBlock(self._prob_now, self.mult_flag,
                                    self.inplanes, planes, stride, img_ds)]
        dep_layers = [StoDepthBlock(self._prob_now, self.mult_flag,
                                    self.inplanes, planes, stride, dep_ds)]
        self._prob_now -= self._prob_step
        self.inplanes = planes
        for _ in range(1, blocks):
            img_layers.append(StoDepthBlock(self._prob_now, self.mult_flag,
                                            planes, planes))
            dep_layers.append(StoDepthBlock(self._prob_now, self.mult_flag,
                                            planes, planes))
            self._prob_now -= self._prob_step
        return Sequential(*img_layers), Sequential(*dep_layers)

    def input_keys(self):
        return ["lr_dem", "image"]

    def __call__(self, params, state, inputs, train: bool = False, rng=None):
        ns = {}

        def run(name, *args, **kw):
            out, s = getattr(self, name)(
                params.get(name, {}), state.get(name, {}), *args,
                train=train, **kw,
            )
            if s:
                ns[name] = s
            return out

        depth, img = inputs[0], inputs[1]
        lidar = depth
        d_clear = depth

        c0_img = run("conv_img", img)
        c0_lidar = run("conv_lidar", depth)

        c_img, c_dyn = c0_img, c0_lidar
        dyns = {}
        for i in range(1, 6):
            new_img = run(f"layer{i}_img", c_img)
            new_dep = run(f"layer{i}_lidar", c_dyn)
            if i < 5:
                c_dyn = run(f"guide{i}", new_dep, new_img)
                dyns[i] = c_dyn
            c_img = new_img
            if i == 5:
                c5 = new_img + new_dep

        def preserve(out):
            if not self.preserve_input:
                return out
            mask = (jnp.sum(d_clear > 0.0, axis=-1, keepdims=True) > 0.0)
            mask = mask.astype(d_clear.dtype)
            return (1.0 - mask) * out + mask * d_clear

        dc4 = run("layer4d", c5)
        c4 = dc4 + dyns[4]
        c4_up = run("upproj0", c4)
        output = jax.lax.stop_gradient(preserve(lidar))
        w0, o0 = run("weight_offset0", output, c4_up)
        output = run("Post_process", output, w0, o0)

        dc3 = run("layer3d", c4)
        c3 = dc3 + dyns[3]
        c3_up = run("upproj1", c3)
        output = jax.lax.stop_gradient(preserve(output))
        w1, o1 = run("weight_offset1", output, c3_up)
        output = run("Post_process", output, w1, o1)

        dc2 = run("layer2d", c3)
        c2 = dc2 + dyns[2]
        c2_up = run("upproj2", c2)
        output = jax.lax.stop_gradient(preserve(output))
        w2, o2 = run("weight_offset2", output, c2_up)
        output = run("Post_process", output, w2, o2)

        dc1 = run("layer1d", c2)
        c1 = dc1 + dyns[1]
        c1 = run("conv", c1)
        c0 = c1 + c0_lidar
        output = jax.lax.stop_gradient(preserve(output))
        w3, o3 = run("weight_offset3", output, c0)
        output = run("Post_process", output, w3, o3)
        return output, ns
