"""Shared model building blocks (reference: models/components/basics.py,
models/components/resnet_cbam.py:36-70).

All blocks are NHWC functional modules from jspsr_tpu.nn.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jspsr_tpu import nn
from jspsr_tpu.nn.module import Module


def conv1x1(cin, cout, stride=1):
    return nn.Conv2d(cin, cout, 1, stride=stride, padding=0, bias=False)


def conv3x3(cin, cout, stride=1):
    return nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)


class ChannelAttention(Module):
    """CBAM channel attention (reference resnet_cbam.py:36-53):
    sigmoid(fc(avg_pool) + fc(max_pool)), fc = 1x1 conv -> ReLU -> 1x1 conv."""

    def __init__(self, in_planes: int, ratio: int = 16):
        super().__init__()
        self.fc1 = nn.Conv2d(in_planes, in_planes // ratio, 1, bias=False)
        self.fc2 = nn.Conv2d(in_planes // ratio, in_planes, 1, bias=False)

    def __call__(self, params, state, x, train: bool = False):
        def fc(v):
            v, _ = self.fc1(params["fc1"], {}, v)
            v = jnp.maximum(v, 0)
            v, _ = self.fc2(params["fc2"], {}, v)
            return v

        avg = fc(nn.global_avg_pool(x))
        mx = fc(nn.global_max_pool(x))
        return jax.nn.sigmoid(avg + mx), {}


class SpatialAttention(Module):
    """CBAM spatial attention (reference resnet_cbam.py:56-70)."""

    def __init__(self, kernel_size: int = 7):
        super().__init__()
        self.conv1 = nn.Conv2d(2, 1, kernel_size, padding=kernel_size // 2, bias=False)

    def __call__(self, params, state, x, train: bool = False):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        y = jnp.concatenate([avg, mx], axis=-1)
        y, _ = self.conv1(params["conv1"], {}, y)
        return jax.nn.sigmoid(y), {}


class Basic2d(Module):
    """conv [+ BN] [+ ReLU/LeakyReLU], optional pre-multiplied channel
    attention (reference basics.py:23-60). Bias present iff no BN."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: int = 3,
        padding: int = 1,
        bn: bool = True,
        relu: bool = True,
        camb: bool = False,
        leaky: bool = False,
    ):
        super().__init__()
        if camb:
            self.camb = ChannelAttention(in_channels, ratio=16)
        else:
            self.camb = None
        self.conv = nn.Conv2d(
            in_channels, out_channels, kernel_size, padding=padding, bias=not bn
        )
        self.bn = nn.BatchNorm2d(out_channels) if bn else None
        self.relu = relu
        self.leaky = leaky

    def __call__(self, params, state, x, train: bool = False):
        new_state = {}
        if self.camb is not None:
            att, _ = self.camb(params["camb"], {}, x, train=train)
            x = att * x
        x, _ = self.conv(params["conv"], {}, x)
        if self.bn is not None:
            x, s = self.bn(params["bn"], state["bn"], x, train=train)
            if s:
                new_state["bn"] = s
        if self.relu:
            x = jnp.where(x >= 0, x, x * 0.2) if self.leaky else jnp.maximum(x, 0)
        return x, new_state


class Basic2dTrans(Module):
    """Basic2d -> ConvTranspose2d(k3 s2 op1) -> BN -> ReLU
    (reference basics.py:63-85). Upsamples 2x."""

    def __init__(self, in_channels: int, out_channels: int, bn: bool = True,
                 camb: bool = False):
        super().__init__()
        self.conv = Basic2d(in_channels, out_channels, 3, 1, bn=bn, camb=camb)
        self.dconv = nn.ConvTranspose2d(
            out_channels, out_channels, 3, stride=2, padding=1, output_padding=1,
            bias=not bn,
        )
        self.bn = nn.BatchNorm2d(out_channels) if bn else None

    def __call__(self, params, state, x, train: bool = False):
        new_state = {}
        x, s = self.conv(params["conv"], state.get("conv", {}), x, train=train)
        if s:
            new_state["conv"] = s
        x, _ = self.dconv(params["dconv"], {}, x)
        if self.bn is not None:
            x, s = self.bn(params["bn"], state["bn"], x, train=train)
            if s:
                new_state["bn"] = s
        x = jnp.maximum(x, 0)
        return x, new_state


class BasicBlock(Module):
    """ResNet BasicBlock with residual scale (reference basics.py:88-123)."""

    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample: Module | None = None,
                 act: bool = True, scale: float = 1.0):
        super().__init__()
        self.conv1 = conv3x3(inplanes, planes, stride)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = conv3x3(planes, planes)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample
        self.act = act
        self.scale = scale

    def __call__(self, params, state, x, train: bool = False):
        new_state = {}
        residual = x
        out, _ = self.conv1(params["conv1"], {}, x)
        out, s = self.bn1(params["bn1"], state["bn1"], out, train=train)
        if s:
            new_state["bn1"] = s
        out = jnp.maximum(out, 0)
        out, _ = self.conv2(params["conv2"], {}, out)
        out, s = self.bn2(params["bn2"], state["bn2"], out, train=train)
        if s:
            new_state["bn2"] = s
        if self.downsample is not None:
            residual, s = self.downsample(
                params["downsample"], state.get("downsample", {}), x, train=train
            )
            if s:
                new_state["downsample"] = s
        out = out * self.scale + residual
        if self.act:
            out = jnp.maximum(out, 0)
        return out, new_state


class Downsample(Module):
    """conv1x1 + BN shortcut projection."""

    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv = conv1x1(cin, cout, stride)
        self.bn = nn.BatchNorm2d(cout)

    def __call__(self, params, state, x, train: bool = False):
        x, _ = self.conv(params["conv"], {}, x)
        x, s = self.bn(params["bn"], state["bn"], x, train=train)
        return x, ({"bn": s} if s else {})


class CBAMBasicBlock(Module):
    """ResNet BasicBlock with CBAM channel+spatial attention
    (reference resnet_cbam.py:73-109)."""

    def __init__(self, inplanes, planes, stride=1, downsample=None, ratio=16):
        super().__init__()
        self.conv1 = conv3x3(inplanes, planes, stride)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = conv3x3(planes, planes)
        self.bn2 = nn.BatchNorm2d(planes)
        self.ca = ChannelAttention(planes, ratio=ratio)
        self.sa = SpatialAttention()
        self.downsample = downsample

    def __call__(self, params, state, x, train: bool = False):
        ns = {}
        residual = x
        out, _ = self.conv1(params["conv1"], {}, x)
        out, s = self.bn1(params["bn1"], state["bn1"], out, train=train)
        if s:
            ns["bn1"] = s
        out = jnp.maximum(out, 0)
        out, _ = self.conv2(params["conv2"], {}, out)
        out, s = self.bn2(params["bn2"], state["bn2"], out, train=train)
        if s:
            ns["bn2"] = s
        att, _ = self.ca(params["ca"], {}, out, train=train)
        out = att * out
        att, _ = self.sa(params["sa"], {}, out, train=train)
        out = att * out
        if self.downsample is not None:
            residual, s = self.downsample(
                params["downsample"], state.get("downsample", {}), x, train=train
            )
            if s:
                ns["downsample"] = s
        out = jnp.maximum(out + residual, 0)
        return out, ns


class Guide(Module):
    """Branch fusion: channel concat, optionally followed by a 3x3 conv when
    cat_only=False (reference basics.py:126-138)."""

    def __init__(self, in_channels, out_channels, bn: bool = True,
                 cat_only: bool = True):
        super().__init__()
        self.cat_only = cat_only
        if not cat_only:
            self.conv = Basic2d(in_channels, out_channels, 3, 1, bn=bn)

    def __call__(self, params, state, feats, train: bool = False):
        out = jnp.concatenate(list(feats), axis=-1)
        if self.cat_only:
            return out, {}
        out, s = self.conv(params["conv"], state.get("conv", {}), out, train=train)
        return out, ({"conv": s} if s else {})
