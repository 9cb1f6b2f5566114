"""Non-local spatial propagation head (reference models/components/nlspn.py).

Predicts per-pixel non-local neighbor offsets and affinities from guidance,
optionally modulates affinities by deformably-gathered confidence, then runs
``prop_time`` iterations of modulated deformable propagation with a frozen
all-ones kernel. Affinity normalization schemes: AS / ASS / TC / TGASS
(tanh, gamma-scaled — reference nlspn.py:92-99,158-173).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jspsr_tpu import nn
from jspsr_tpu.nn.module import Module, ParamLeaf
from jspsr_tpu.ops.deform_conv import deform_conv2d


def _zeros(key, shape):
    return jnp.zeros(shape, jnp.float32)


def _zero_init(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


class NLSPN(Module):
    def __init__(self, ch_g, ch_f=1, k_g=3, k_f=3, prop_time=6,
                 affinity="TGASS", affinity_gamma=0.5, conf_prop=True,
                 preserve_input=False, legacy=False):
        super().__init__()
        assert ch_f == 1, "only ch_f == 1 supported"
        assert k_g % 2 == 1 and k_f % 2 == 1
        assert affinity in ("AS", "ASS", "TC", "TGASS")
        self.prop_time = prop_time
        self.affinity = affinity
        self.ch_g, self.ch_f = ch_g, ch_f
        self.k_g, self.k_f = k_g, k_f
        self.num = k_f * k_f - 1
        self.idx_ref = self.num // 2
        self.conf_prop = conf_prop
        self.preserve_input = preserve_input
        self.legacy = legacy

        # zero-initialized like the reference (nlspn.py:44-45)
        self.conv_offset_aff = nn.Conv2d(
            ch_g, 3 * self.num, k_g, padding=(k_g - 1) // 2, bias=True,
            weight_init=_zero_init,
        )
        if affinity == "TC":
            init = lambda key, shape: float(self.num) * jnp.ones(shape)
        elif affinity == "TGASS":
            g = affinity_gamma * self.num
            init = lambda key, shape: g * jnp.ones(shape)
        else:
            init = lambda key, shape: jnp.ones(shape)
        self.aff_scale_const = ParamLeaf((1,), init)
        # frozen gather kernels (nlspn.py:61-68)
        self.w = ParamLeaf((k_f, k_f, 1, 1), lambda k, s: jnp.ones(s))
        self.b = ParamLeaf((1,), _zeros)
        self.w_conf = ParamLeaf((1, 1, 1, 1), lambda k, s: jnp.ones(s))

    def _get_offset_affinity(self, params, guidance, confidence):
        b, h, w, _ = guidance.shape
        num = self.num
        off_aff, _ = self.conv_offset_aff(params["conv_offset_aff"], {},
                                          guidance)
        o1 = off_aff[..., :num]
        o2 = off_aff[..., num:2 * num]
        aff = off_aff[..., 2 * num:]

        # channel grouping quirk preserved: cat(o1, o2) reinterpreted as
        # (num, 2) pairs (reference nlspn.py:85-90)
        off = jnp.concatenate([o1, o2], axis=-1).reshape(b, h, w, num, 2)
        zero = jnp.zeros((b, h, w, 1, 2), off.dtype)
        offset = jnp.concatenate(
            [off[:, :, :, :self.idx_ref], zero, off[:, :, :, self.idx_ref:]],
            axis=3,
        ).reshape(b, h, w, 2 * (num + 1))

        scale = params["aff_scale_const"]["value"]
        if self.affinity == "TC":
            aff = jnp.tanh(aff / 100.0) / scale
        elif self.affinity == "TGASS":
            aff = jnp.tanh(aff / 100.0) / (scale + 1e-8)

        if self.conf_prop and confidence is not None:
            # modulate each non-center tap's affinity by the confidence
            # deformably sampled at that tap's offset (nlspn.py:104-156)
            w_conf = jax.lax.stop_gradient(params["w_conf"]["value"])
            b0 = jax.lax.stop_gradient(params["b"]["value"])
            offset_pairs = jax.lax.stop_gradient(
                offset.reshape(b, h, w, num + 1, 2)
            )
            ones = jnp.ones((b, h, w, 1), offset.dtype)
            confs = []
            for idx in range(num + 1):
                if idx == self.idx_ref:
                    continue
                off_tap = offset_pairs[:, :, :, idx, :]
                conf_tmp = deform_conv2d(
                    confidence, off_tap, w_conf, b0, ones,
                    stride=1, padding=0, dilation=1,
                )
                confs.append(conf_tmp)
            conf_aff = jnp.concatenate(confs, axis=-1)
            aff = aff * conf_aff

        aff_abs = jnp.abs(aff)
        aff_abs_sum = jnp.sum(aff_abs, axis=-1, keepdims=True) + 1e-4
        if self.affinity in ("ASS", "TGASS"):
            aff_abs_sum = jnp.maximum(aff_abs_sum, 1.0)
        if self.affinity in ("AS", "ASS", "TGASS"):
            aff = aff / aff_abs_sum
        aff_sum = jnp.sum(aff, axis=-1, keepdims=True)
        aff_ref = 1.0 - aff_sum
        aff = jnp.concatenate(
            [aff[..., :self.idx_ref], aff_ref, aff[..., self.idx_ref:]],
            axis=-1,
        )
        return offset, aff

    def __call__(self, params, state, feat_init, guidance, confidence=None,
                 feat_fix=None, train: bool = False):
        offset, aff = self._get_offset_affinity(params, guidance, confidence)
        w = jax.lax.stop_gradient(params["w"]["value"])
        b0 = jax.lax.stop_gradient(params["b"]["value"])

        if self.preserve_input and feat_fix is not None:
            mask_fix = (jnp.sum(feat_fix > 0.0, axis=-1, keepdims=True) > 0.0)
            mask_fix = jax.lax.stop_gradient(mask_fix.astype(feat_fix.dtype))

        feat = feat_init
        pad = (self.k_f - 1) // 2
        for _ in range(self.prop_time):
            if self.preserve_input and feat_fix is not None:
                feat = (1.0 - mask_fix) * feat + mask_fix * feat_fix
            feat = deform_conv2d(feat, offset, w, b0, aff,
                                 stride=1, padding=pad, dilation=1)
        return (feat, offset, aff), {}
