"""CompletionFormer baseline (reference models/CompletionFormer.py +
models/components/completion_former_backbone.py): PVT-transformer backbone
producing (init depth, guidance, confidence), followed by NLSPN diffusion.

The reference passes parse_input flags in the wrong order
(CompletionFormer.py:40-46, canopy/coord swapped — SURVEY 2.2); here inputs
are explicit: [dem, stacked_guidance] where guidance stacks image(+mask)
(+canopy) channels.
"""

from __future__ import annotations

import jax.numpy as jnp

from jspsr_tpu import nn
from jspsr_tpu.nn.module import Module, Sequential
from jspsr_tpu.models.components import CBAMBasicBlock
from jspsr_tpu.models.nlspn import NLSPN
from jspsr_tpu.models.pvt import PVT


def conv_bn_relu(cin, cout, kernel, stride=1, padding=0, bn=True, relu=True):
    mods = [nn.Conv2d(cin, cout, kernel, stride=stride, padding=padding,
                      bias=not bn)]
    if bn:
        mods.append(nn.BatchNorm2d(cout))
    if relu:
        mods.append(nn.ReLU())
    return Sequential(*mods)


def convt_bn_relu(cin, cout, kernel, stride=1, padding=0, output_padding=0,
                  bn=True, relu=True):
    mods = [nn.ConvTranspose2d(cin, cout, kernel, stride=stride,
                               padding=padding, output_padding=output_padding,
                               bias=not bn)]
    if bn:
        mods.append(nn.BatchNorm2d(cout))
    if relu:
        mods.append(nn.ReLU())
    return Sequential(*mods)


class Backbone(Module):
    def __init__(self, guidance_channels: int, prop_kernel: int = 3,
                 conf_prop: bool = True):
        super().__init__()
        self.conf_prop = conf_prop
        self.num_neighbors = prop_kernel * prop_kernel - 1
        ic = guidance_channels

        self.conv1_rgb = conv_bn_relu(ic, ic * 16, 3, 1, 1, bn=False)
        self.conv1_dep = conv_bn_relu(1, 16, 3, 1, 1, bn=False)
        self.conv1 = conv_bn_relu((ic + 1) * 16, 64, 3, 1, 1, bn=False)

        self.former = PVT(in_chans=128, patch_size=2)

        ch = [64, 128, 64, 128, 320, 512]
        self.dec6 = Sequential(
            convt_bn_relu(ch[5], 256, 3, 2, 1, 1),
            CBAMBasicBlock(256, 256, ratio=16),
        )
        self.dec5 = Sequential(
            convt_bn_relu(256 + ch[4], 128, 3, 2, 1, 1),
            CBAMBasicBlock(128, 128, ratio=8),
        )
        self.dec4 = Sequential(
            convt_bn_relu(128 + ch[3], 64, 3, 2, 1, 1),
            CBAMBasicBlock(64, 64, ratio=4),
        )
        self.dec3 = Sequential(
            convt_bn_relu(64 + ch[2], 64, 3, 2, 1, 1),
            CBAMBasicBlock(64, 64, ratio=4),
        )
        self.dec2 = Sequential(
            convt_bn_relu(64 + ch[1], 64, 3, 2, 1, 1),
            CBAMBasicBlock(64, 64, ratio=4),
        )
        self.dep_dec1 = conv_bn_relu(64 + 64, 64, 3, 1, 1)
        self.dep_dec0 = conv_bn_relu(64 + 64, 1, 3, 1, 1, bn=False, relu=True)
        self.gd_dec1 = conv_bn_relu(64 + ch[0], 64, 3, 1, 1)
        self.gd_dec0 = conv_bn_relu(64 + 64, self.num_neighbors, 3, 1, 1,
                                    bn=False, relu=False)
        if conf_prop:
            self.cf_dec1 = conv_bn_relu(64 + ch[0], 32, 3, 1, 1)
            self.cf_dec0 = Sequential(
                nn.Conv2d(32 + 64, 1, 3, padding=1, bias=True), nn.Sigmoid()
            )

    @staticmethod
    def _concat(fd, fe):
        """Resize decoder feature to encoder size (align_corners=True
        bilinear, reference backbone.py:163-172) and concat."""
        _, he, we, _ = fe.shape
        fd = nn.bilinear_resize(fd, he, we, align_corners=True)
        return jnp.concatenate([fd, fe], axis=-1)

    def __call__(self, params, state, rgb, depth, train: bool = False,
                 rng=None):
        ns = {}

        def run(name, *args, **kw):
            out, s = getattr(self, name)(
                params.get(name, {}), state.get(name, {}), *args,
                train=train, **kw,
            )
            if s:
                ns[name] = s
            return out

        fe1_rgb = run("conv1_rgb", rgb)
        fe1_dep = run("conv1_dep", depth)
        fe1 = jnp.concatenate([fe1_rgb, fe1_dep], axis=-1)
        fe1 = run("conv1", fe1)

        (fe2, fe3, fe4, fe5, fe6, fe7) = run("former", fe1, rng=rng)

        fd6 = run("dec6", fe7)
        fd5 = run("dec5", self._concat(fd6, fe6))
        fd4 = run("dec4", self._concat(fd5, fe5))
        fd3 = run("dec3", self._concat(fd4, fe4))
        fd2 = run("dec2", self._concat(fd3, fe3))

        dep_fd1 = run("dep_dec1", self._concat(fd2, fe2))
        init_depth = run("dep_dec0", self._concat(dep_fd1, fe1))
        gd_fd1 = run("gd_dec1", self._concat(fd2, fe2))
        guide = run("gd_dec0", self._concat(gd_fd1, fe1))
        confidence = None
        if self.conf_prop:
            cf_fd1 = run("cf_dec1", self._concat(fd2, fe2))
            confidence = run("cf_dec0", self._concat(cf_fd1, fe1))
        return (init_depth, guide, confidence), ns


class CompletionFormer(Module):
    def __init__(self, in_channels: dict, out_channels: int = 1,
                 prop_time: int = 6, prop_kernel: int = 3,
                 conf_prop: bool = True, affinity: str = "TGASS",
                 affinity_gamma: float = 0.5, preserve_input: bool = False):
        super().__init__()
        self.name = "CompletionFormer"
        guidance_ch = sum(
            v for k, v in in_channels.items()
            if k in ("image", "mask", "canopy", "coord")
        )
        self.prop_time = prop_time
        self.backbone = Backbone(guidance_ch, prop_kernel, conf_prop)
        num_neighbors = prop_kernel * prop_kernel - 1
        if prop_time > 0:
            self.prop_layer = NLSPN(
                num_neighbors, 1, 3, prop_kernel, prop_time, affinity,
                affinity_gamma, conf_prop, preserve_input,
            )

    def input_keys(self):
        return ["lr_dem", "guidance"]

    def __call__(self, params, state, inputs, train: bool = False, rng=None):
        dep, rgb = inputs[0], inputs[1]
        ns = {}
        (pred_init, guide, confidence), s = self.backbone(
            params["backbone"], state["backbone"], rgb, dep, train=train,
            rng=rng,
        )
        if s:
            ns["backbone"] = s
        pred_init = pred_init + dep
        if self.prop_time > 0:
            (y, _, _), _ = self.prop_layer(
                params["prop_layer"], state.get("prop_layer", {}),
                pred_init, guide, confidence, dep, train=train,
            )
        else:
            y = pred_init
        return y, ns
