"""EDSR baseline (reference models/EDSR.py): residual CNN super-resolution,
optionally with the SPN refinement head on the DEM channel.

In the shipped DEM configs EDSR runs at scale=1 (the LR DEM is pre-resampled
onto the target grid), so the PixelShuffle upscaler is skipped; it is kept
for scale 2/4 image SR parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jspsr_tpu import nn
from jspsr_tpu.nn import initializers as inits
from jspsr_tpu.nn.module import Module, Sequential
from jspsr_tpu.models.spn import Generator, PostProcessor

_EDSR_INIT = inits.normal_fan_out(2.0)


def _conv(cin, cout, k=3, bias=True):
    return nn.Conv2d(cin, cout, k, padding=k // 2, bias=bias,
                     weight_init=_EDSR_INIT)


class ResBlock(Module):
    """conv-ReLU-conv with scaled residual (reference EDSR.py:13-44)."""

    def __init__(self, n_feat, kernel_size=3, res_scale=1.0):
        super().__init__()
        self.conv1 = _conv(n_feat, n_feat, kernel_size)
        self.conv2 = _conv(n_feat, n_feat, kernel_size)
        self.res_scale = res_scale

    def __call__(self, params, state, x, train: bool = False):
        y, _ = self.conv1(params["conv1"], {}, x)
        y = jnp.maximum(y, 0)
        y, _ = self.conv2(params["conv2"], {}, y)
        return y * self.res_scale + x, {}


class Upscaler(Module):
    """conv + PixelShuffle x2 (x4 chains two) (reference EDSR.py:47-63)."""

    def __init__(self, n_feat, scale):
        super().__init__()
        assert scale in (2, 4)
        self.scale = scale
        self.conv1 = _conv(n_feat, n_feat * 4, 3)
        if scale == 4:
            self.conv2 = _conv(n_feat, n_feat * 4, 3)

    def __call__(self, params, state, x, train: bool = False):
        x, _ = self.conv1(params["conv1"], {}, x)
        x = nn.pixel_shuffle(x, 2)
        if self.scale == 4:
            x, _ = self.conv2(params["conv2"], {}, x)
            x = nn.pixel_shuffle(x, 2)
        return x, {}


class EDSR(Module):
    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        n_resblocks: int = 16,
        n_features: int = 64,
        scale: int = 1,
        res_scale: float = 0.1,
        spn: bool = False,
    ):
        super().__init__()
        self.name = "EDSR"
        # default public-checkpoint path for model_kwargs.pretrained=True
        # (reference models/EDSR.py:87; loaded positionally since the public
        # EDSR repo uses different module names — utils/pretrained.py)
        self.url = "./models/pretrained/EDSR-b32f128x2.bin"
        self.res_scale = res_scale
        self.spn = spn
        self.entry = _conv(in_channels, n_features, 3)
        blocks = [ResBlock(n_features, 3, res_scale) for _ in range(n_resblocks)]
        blocks.append(_conv(n_features, n_features, 3))
        self.encoder = Sequential(*blocks)
        self.decoder = Upscaler(n_features, scale) if scale > 1 else None
        if spn:
            self.generator = Generator(n_features, 3, bc=n_features // 2)
            self.post_layer = PostProcessor(3, residual=True)
        else:
            self.head = _conv(n_features, out_channels, 3)

    def __call__(self, params, state, x, train: bool = False, rng=None):
        if isinstance(x, (list, tuple)):
            x = jnp.concatenate(list(x), axis=-1)
        ns = {}
        if self.spn:
            dem = jax.lax.stop_gradient(x)[..., 0:1]
        xs, _ = self.entry(params["entry"], {}, x)
        y, _ = self.encoder(params["encoder"], state.get("encoder", {}), xs,
                            train=train)
        y = y + self.res_scale * xs
        if self.decoder is not None:
            y, _ = self.decoder(params["decoder"], {}, y, train=train)
        if self.spn:
            (weight, offset), s = self.generator(
                params["generator"], state.get("generator", {}), dem, y, train=train
            )
            if s:
                ns["generator"] = s
            y, _ = self.post_layer(params["post_layer"], {}, dem, weight, offset)
        else:
            y, _ = self.head(params["head"], {}, y)
        return y, ns
