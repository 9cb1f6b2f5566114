"""Joint spatial-propagation refinement head (reference models/components/spn.py).

- ``Generator``: predicts a per-pixel 3x3 affinity field (sigmoid, K=9
  channels) and deformable sampling offsets for the K-1 non-center taps
  (2*(K-1)=16 channels, zero inserted at the center tap).
- ``PostProcessor``: zero-sums the affinity (residual mode) and applies ONE
  modulated deformable convolution to the raw LR DEM with a learnable 3x3
  kernel (initialized to ones) + bias, adding scale * init_dem back.

The deformable conv is the framework's fused XLA/Pallas primitive
(jspsr_tpu.ops) instead of torchvision's CUDA kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jspsr_tpu import nn
from jspsr_tpu.nn.module import Module
from jspsr_tpu.models.components import Basic2d, BasicBlock
from jspsr_tpu.ops.deform_conv import deform_conv2d, insert_zero_center_offset


class Generator(Module):
    """Affinity/offset generator (reference spn.py:8-75)."""

    def __init__(self, in_channels: int, kernel_size: int = 3, bc: int = 16,
                 leaky: bool = False):
        super().__init__()
        self.kernel_size = kernel_size
        self.num = kernel_size * kernel_size - 1

        self.convd1 = Basic2d(1, bc * 2, 3, 1, bn=False, relu=True, leaky=leaky)
        self.convd2 = Basic2d(bc * 2, bc * 2, 3, 1, bn=False, relu=True, leaky=leaky)
        self.convf1 = Basic2d(in_channels, bc * 2, 3, 1, bn=False, relu=True,
                              leaky=leaky)
        self.convf2 = Basic2d(bc * 2, bc * 2, 3, 1, bn=False, relu=True, leaky=leaky)
        self.conv = Basic2d(bc * 4, bc * 4, 3, 1, bn=False, relu=True, leaky=leaky)
        self.block = BasicBlock(bc * 4, bc * 4)
        self.conv_weight = nn.Conv2d(bc * 4, kernel_size**2, 1, padding=0, bias=True)
        self.conv_offset = Basic2d(bc * 4, 2 * self.num, kernel_size=1, padding=0,
                                   bn=False, relu=False)

    def __call__(self, params, state, dem, context, train: bool = False):
        new_state = {}
        d1, _ = self.convd1(params["convd1"], {}, dem, train=train)
        d2, _ = self.convd2(params["convd2"], {}, d1, train=train)
        f1, _ = self.convf1(params["convf1"], {}, context, train=train)
        f2, _ = self.convf2(params["convf2"], {}, f1, train=train)
        feat = jnp.concatenate([d2, f2], axis=-1)
        feat, _ = self.conv(params["conv"], {}, feat, train=train)
        feat, s = self.block(params["block"], state["block"], feat, train=train)
        if s:
            new_state["block"] = s
        # Both 1x1 heads in ONE conv (exact: concatenated output channels
        # are independent rows of the same matmul) — the full-res feature
        # map is read once instead of twice (bandwidth-bound at 128^2).
        # Param tree keeps the reference's separate conv_weight/conv_offset
        # modules; the merge happens at trace time.
        k2 = self.kernel_size ** 2
        w_cat = jnp.concatenate(
            [params["conv_weight"]["w"], params["conv_offset"]["conv"]["w"]],
            axis=-1).astype(feat.dtype)
        b_cat = jnp.concatenate(
            [params["conv_weight"]["b"], params["conv_offset"]["conv"]["b"]]
        ).astype(feat.dtype)
        heads = jax.lax.conv_general_dilated(
            feat, w_cat, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b_cat
        weight = jax.nn.sigmoid(heads[..., :k2])
        offset = insert_zero_center_offset(heads[..., k2:], self.kernel_size)
        return (weight, offset), new_state


class PostProcessor(Module):
    """Deformable refinement of the raw DEM (reference spn.py:79-118)."""

    def __init__(self, kernel_size: int = 3, residual: bool = True,
                 scale: float = 1.0, sample_dtype: str | None = None):
        super().__init__()
        self.kernel_size = kernel_size
        self.residual = residual
        self.scale = scale
        # sample_dtype='bfloat16': run the deformable sampling's image
        # matmuls in bf16 (Pallas kernel fast path; fp32 accumulation).
        # The residual add below stays in the caller's dtype regardless.
        self.sample_dtype = sample_dtype

    def init(self, rng):
        k = self.kernel_size
        # learnable all-ones 3x3 kernel + scalar bias (HWIO: 1-in, 1-out)
        return {"w": jnp.ones((k, k, 1, 1), jnp.float32),
                "b": jnp.zeros((1,), jnp.float32)}, {}

    def __call__(self, params, state, init_dem, weight, offset,
                 train: bool = False):
        if self.residual:
            # zero-sum affinity: refinement is a pure neighbor *correction*
            weight = weight - jnp.mean(weight, axis=-1, keepdims=True)
        else:
            weight = weight / jnp.sum(weight, axis=-1, keepdims=True)
        pad = (self.kernel_size - 1) // 2
        # x_grad=False: the DEM reaching the SPN head is detached in both
        # JSPSR (reference JSPSR.py:372) and EDSR (EDSR.py:124-125), so the
        # fused backward skips the dead input-scatter matmul
        refined = deform_conv2d(
            init_dem, offset, params["w"], params["b"], weight,
            stride=1, padding=pad, dilation=1, x_grad=False,
            sample_dtype=self.sample_dtype,
        )
        if self.residual:
            refined = refined + self.scale * init_dem
        return refined, {}
