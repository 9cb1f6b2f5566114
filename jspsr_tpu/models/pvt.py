"""Pyramid Vision Transformer variant (reference models/components/pvt.py).

PVT stages with spatial-reduction attention, each Block fusing a parallel
CBAM conv branch by concat-conv (pvt.py:131-191); ResNet34 layer1/layer2 as
the convolutional embedding (pvt.py:249-252, randomly initialized here —
the reference's pretrained files are load-optional and absent).

Position embeddings are stored at the declared 224-based grid and
bilinearly resized to the runtime token grid (pvt.py:322-336), keeping the
reference's quirk of comparing every stage's token count against stage 1's.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jspsr_tpu import nn
from jspsr_tpu.nn.module import Module, ParamLeaf, Sequential
from jspsr_tpu.models.components import CBAMBasicBlock
from jspsr_tpu.models.lrru import LBasicBlock, LDownsample


def _trunc02(key, shape):
    return jax.random.normal(key, shape, jnp.float32) * 0.02


class Mlp(Module):
    def __init__(self, in_features, hidden_features):
        super().__init__()
        self.fc1 = nn.Dense(in_features, hidden_features)
        self.fc2 = nn.Dense(hidden_features, in_features)

    def __call__(self, params, state, x, train: bool = False):
        x, _ = self.fc1(params["fc1"], {}, x)
        x = jax.nn.gelu(x, approximate=False)
        x, _ = self.fc2(params["fc2"], {}, x)
        return x, {}


class Attention(Module):
    """Spatial-reduction multi-head attention (pvt.py:63-128)."""

    def __init__(self, dim, num_heads=8, qkv_bias=False, sr_ratio=1):
        super().__init__()
        assert dim % num_heads == 0
        self.dim = dim
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.q = nn.Dense(dim, dim, bias=qkv_bias)
        self.kv = nn.Dense(dim, dim * 2, bias=qkv_bias)
        self.proj = nn.Dense(dim, dim)
        self.sr_ratio = sr_ratio
        if sr_ratio > 1:
            self.sr = nn.Conv2d(dim, dim, sr_ratio, stride=sr_ratio, padding=0)
            self.norm = nn.LayerNorm(dim)

    def __call__(self, params, state, x, h, w, train: bool = False):
        b, n, c = x.shape
        nh = self.num_heads
        q, _ = self.q(params["q"], {}, x)
        q = q.reshape(b, n, nh, c // nh).transpose(0, 2, 1, 3)

        if self.sr_ratio > 1:
            x_ = x.transpose(0, 2, 1).reshape(b, c, h, w).transpose(0, 2, 3, 1)
            x_, _ = self.sr(params["sr"], {}, x_)  # NHWC
            x_ = x_.reshape(b, -1, c)
            x_, _ = self.norm(params["norm"], {}, x_)
            kv_in = x_
        else:
            kv_in = x
        kv, _ = self.kv(params["kv"], {}, kv_in)
        m = kv.shape[1]
        kv = kv.reshape(b, m, 2, nh, c // nh).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]

        attn = (q @ k.transpose(0, 1, 3, 2)) * self.scale
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, c)
        out, _ = self.proj(params["proj"], {}, out)
        return out, {}


class PVTBlock(Module):
    """Transformer block + parallel CBAM conv branch, concat-conv fusion."""

    def __init__(self, dim, num_heads, mlp_ratio=4.0, qkv_bias=False,
                 drop_path=0.0, sr_ratio=1):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = Attention(dim, num_heads, qkv_bias, sr_ratio)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))
        self.resblock = CBAMBasicBlock(dim, dim, ratio=16)
        self.concat_conv = nn.Conv2d(dim * 2, dim, 3, padding=1, bias=False)
        self.drop_path = drop_path

    def _dp(self, branch, x, train, rng):
        """Stochastic depth on a residual branch (timm DropPath)."""
        if not train or self.drop_path <= 0.0 or rng is None:
            return branch
        keep = 1.0 - self.drop_path
        mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1))
        return branch * mask.astype(branch.dtype) / keep

    def __call__(self, params, state, x, h, w, train: bool = False, rng=None):
        ns = {}
        inp = x
        y, _ = self.norm1(params["norm1"], {}, x)
        y, _ = self.attn(params["attn"], {}, y, h, w, train=train)
        x = x + self._dp(y, x, train, rng)
        y, _ = self.norm2(params["norm2"], {}, x)
        y, _ = self.mlp(params["mlp"], {}, y, train=train)
        x = x + self._dp(y, x, train, rng)

        b, n, c = inp.shape
        conv_in = inp.reshape(b, h, w, c)
        conv_out, s = self.resblock(params["resblock"], state["resblock"],
                                    conv_in, train=train)
        if s:
            ns["resblock"] = s
        xt = x.reshape(b, h, w, c)
        fused = jnp.concatenate([xt, conv_out], axis=-1)
        fused, _ = self.concat_conv(params["concat_conv"], {}, fused)
        return fused.reshape(b, n, c), ns


class PatchEmbed(Module):
    def __init__(self, img_size, patch_size, in_chans, embed_dim):
        super().__init__()
        self.patch_size = patch_size
        self.grid = (img_size // patch_size, img_size // patch_size)
        self.num_patches = self.grid[0] * self.grid[1]
        self.proj = nn.Conv2d(in_chans, embed_dim, patch_size,
                              stride=patch_size, padding=0)
        self.norm = nn.LayerNorm(embed_dim)

    def __call__(self, params, state, x, train: bool = False):
        # x NHWC -> tokens (B, N, C)
        y, _ = self.proj(params["proj"], {}, x)
        b, h, w, c = y.shape
        y = y.reshape(b, h * w, c)
        y, _ = self.norm(params["norm"], {}, y)
        return (y, (h, w)), {}


def _resnet34_layer1():
    return Sequential(*[LBasicBlock(64, 64) for _ in range(3)])


def _resnet34_layer2():
    blocks = [LBasicBlock(64, 128, 2, LDownsample(64, 128, 2))]
    blocks += [LBasicBlock(128, 128) for _ in range(3)]
    return Sequential(*blocks)


class PVT(Module):
    def __init__(self, in_chans=128, patch_size=2, img_size=224,
                 embed_dims=(64, 128, 320, 512), num_heads=(1, 2, 5, 8),
                 mlp_ratios=(8, 8, 4, 4), qkv_bias=True,
                 depths=(3, 4, 6, 3), sr_ratios=(8, 4, 2, 1),
                 drop_path_rate=0.1):
        super().__init__()
        self.depths = depths
        self.num_stages = len(depths)
        self.embed_layer1 = _resnet34_layer1()
        self.embed_layer2 = _resnet34_layer2()

        dpr = [float(v) for v in
               jnp.linspace(0, drop_path_rate, sum(depths))]
        cur = 0
        for i in range(self.num_stages):
            pe = PatchEmbed(
                img_size if i == 0 else img_size // (2 ** (i + 1)),
                patch_size if i == 0 else 2,
                in_chans if i == 0 else embed_dims[i - 1],
                embed_dims[i],
            )
            np_i = pe.num_patches + (1 if i == self.num_stages - 1 else 0)
            setattr(self, f"patch_embed{i + 1}", pe)
            setattr(self, f"pos_embed{i + 1}",
                    ParamLeaf((1, np_i, embed_dims[i]), _trunc02))
            blocks = Sequential(*[
                PVTBlock(embed_dims[i], num_heads[i], mlp_ratios[i], qkv_bias,
                         dpr[cur + j], sr_ratios[i])
                for j in range(depths[i])
            ])
            setattr(self, f"block{i + 1}", blocks)
            cur += depths[i]

    def _pos(self, pos, pe: PatchEmbed, h, w):
        """Resize the stored pos-embed grid to the runtime grid
        (reference pvt.py:322-336; note: compares against STAGE-1 patches)."""
        if h * w == self.patch_embed1.num_patches:
            return pos
        gh, gw = pe.grid
        pos2d = pos.reshape(1, gh, gw, -1)
        pos2d = nn.bilinear_resize(pos2d, h, w, align_corners=False)
        return pos2d.reshape(1, h * w, -1)

    def __call__(self, params, state, x, train: bool = False, rng=None):
        """x: NHWC (64 ch). Returns 6 NHWC feature maps (fe2..fe7)."""
        ns = {}
        outs = []
        y, s = self.embed_layer1(params["embed_layer1"], state["embed_layer1"],
                                 x, train=train)
        if s:
            ns["embed_layer1"] = s
        outs.append(y)
        y, s = self.embed_layer2(params["embed_layer2"], state["embed_layer2"],
                                 y, train=train)
        if s:
            ns["embed_layer2"] = s
        outs.append(y)

        b = x.shape[0]
        for i in range(self.num_stages):
            pe = getattr(self, f"patch_embed{i + 1}")
            (tokens, (h, w)), _ = pe(params[f"patch_embed{i + 1}"], {}, y,
                                     train=train)
            pos = params[f"pos_embed{i + 1}"]["value"]
            if i == self.num_stages - 1:
                pos = pos[:, 1:]
            tokens = tokens + self._pos(pos, pe, h, w)
            blocks = getattr(self, f"block{i + 1}")
            bs = {}
            for name, blk in blocks.mods:
                sub_rng = (jax.random.fold_in(rng, i * 100 + int(name))
                           if rng is not None else None)
                tokens, s = blk(
                    params[f"block{i + 1}"][name],
                    state[f"block{i + 1}"][name],
                    tokens, h, w, train=train, rng=sub_rng,
                )
                if s:
                    bs[name] = s
            if bs:
                ns[f"block{i + 1}"] = bs
            y = tokens.reshape(b, h, w, -1)
            outs.append(y)
        return outs, ns
