"""JSPSR: multi-branch guided DEM super-resolution network with a joint
spatial-propagation refinement head (reference models/JSPSR.py).

Architecture (cat_only fusion, nf=32, B = number of branches):

- per-branch 5x5 stems (BN only on the image stem) -> nf
- 4 encoder stages of paired BasicBlocks; after every stage the branches are
  fused by channel concat (Guide), and the DEM branch's next stage consumes
  the fused tensor (nf*2^s * B channels), strides 1,2,2,2
- decoder: 3 x Basic2dTrans (channel-attention conv + transposed conv 2x)
  with concat skip connections to the fused encoder features, then conv0
- SPN head: stop_gradient(dem) -> Generator -> (affinity, offsets) ->
  PostProcessor (one modulated deformable conv over the raw DEM, residual)

Branches: dem (required) + optional image + at most one aux of
{mask, canopy, coord} (reference JSPSR.py:34-64).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jspsr_tpu import nn
from jspsr_tpu.nn.module import Module, Sequential
from jspsr_tpu.models.components import (
    Basic2d,
    Basic2dTrans,
    BasicBlock,
    Downsample,
    Guide,
)
from jspsr_tpu.models.spn import Generator, PostProcessor

AUX_KEYS = ("mask", "canopy", "coord")


def _make_branch_layer(inplanes, planes, blocks, stride, res_scale, fused_in):
    """One encoder stage for one branch: [block(fused_in -> planes, stride,
    downsample), block(planes -> planes), ...]."""
    need_ds = stride != 1 or inplanes != planes
    ds = Downsample(fused_in, planes, stride) if need_ds else None
    mods = [BasicBlock(fused_in, planes, stride, ds, act=True, scale=res_scale)]
    for _ in range(1, blocks):
        mods.append(BasicBlock(planes, planes, 1, None, act=True, scale=res_scale))
    return Sequential(*mods)


class JSPSR(Module):
    def __init__(
        self,
        in_channels: dict,
        out_channels: int = 1,
        num_feature: int = 32,
        layers: tuple = (2, 2, 2, 2),
        res_scale: tuple = (1, 1, 1, 1),
        spn: bool = True,
        spn_scale: float = 1.0,
        cat_only: bool = True,
        generator_leaky: bool = False,
        remat_stages: bool = False,
        fuse_stems: bool = False,
        eval_grouped: bool = False,
        compute_dtype=None,
        spn_sample_dtype: str | None = None,
    ):
        super().__init__()
        self.name = "JSPSR"
        self.in_channels = dict(in_channels)
        self.spn = spn
        # fuse_stems: run the per-branch 5x5 stems as ONE block-diagonal conv
        # (exact arithmetic). Default OFF: measured on v5e at b16 128^2 the
        # dense fused conv (19 in x 96 out channel pairs vs 1x32+3x32+15x32
        # for the separate stems = 3x the MAC count) costs +9.7 ms on the
        # eval forward and is train-neutral (scripts/bench_mixed_probe.py,
        # PERF.md "fused stems"). Kept as an option because the tradeoff
        # reverses on MXU generations where tiny-Cin convs pad worse.
        self.fuse_stems = fuse_stems
        # eval_grouped: run same-shape per-branch encoder BasicBlocks as ONE
        # grouped conv across branches (feature_group_count = #branches,
        # exact arithmetic — weights stay per-branch in the param tree and
        # are concatenated at trace time). EVAL ONLY: the grouped-conv
        # GRADIENTS measured slower than separate convs at every stage
        # shape, but the grouped FORWARD wins at the MXU-hostile 64-ch
        # stage-1 width (scripts/bench_branch_fuse.py, PERF.md "Grouped
        # branch-conv fusion"). Train always uses the separate path.
        self.eval_grouped = eval_grouped
        # compute_dtype: mixed-precision body. bfloat16 runs the encoder/
        # decoder/generator features in bf16 (2x MXU, half the HBM traffic
        # of the bandwidth-bound full-res layers) while keeping everything
        # precision-critical in fp32: the raw DEM, the deformable sampling
        # (weights/offsets are cast back), BN statistics, and the loss.
        # Round-1's all-bf16 test (+1.55 m RMSE) failed because the DEM
        # VALUES were quantized; here they never leave fp32.
        self.compute_dtype = (
            jnp.dtype(compute_dtype) if compute_dtype is not None
            else jnp.dtype(jnp.float32)
        )
        assert len(in_channels) > 1, "At least 2 input modalities are required"
        assert "lr_dem" in in_channels
        self.cat_only = cat_only
        # per-stage rematerialization: save only stage-boundary activations
        # during backward (finer-grained than whole-forward jax.checkpoint;
        # unlocks larger train batches on 16G HBM)
        self.remat_stages = remat_stages

        self.has_img = "image" in in_channels
        aux = [k for k in AUX_KEYS if k in in_channels]
        assert len(aux) <= 1, f"at most one aux branch, got {aux}"
        self.aux_key = aux[0] if aux else None
        assert self.has_img or self.aux_key, "at least one guidance branch"
        nb = 1 + int(self.has_img) + int(self.aux_key is not None)
        self.num_branch = nb

        nf = num_feature
        self.conv_dem = Basic2d(in_channels["lr_dem"], nf, 5, 2, bn=False)
        self.conv_img = (
            Basic2d(in_channels["image"], nf, 5, 2, bn=True) if self.has_img else None
        )
        self.conv_aux = (
            Basic2d(in_channels[self.aux_key], nf, 5, 2, bn=False)
            if self.aux_key
            else None
        )

        # Encoder stages. Stage s: branch channels nf*2^s; the DEM branch's
        # input is the concat-fused tensor (inplanes * nb) for stages 2-4
        # and inplanes*1 for stage 1 (reference JSPSR.py:90-143).
        stage_in = [nf, nf * 2, nf * 4, nf * 8]
        stage_out = [nf * 2, nf * 4, nf * 8, nf * 16]
        stage_stride = [1, 2, 2, 2]
        stage_nb = [1, nb, nb, nb]  # fused-width multiplier of the dem input
        for s in range(4):
            fused_in = stage_in[s] * (stage_nb[s] if cat_only else 1)
            dem_l = _make_branch_layer(
                stage_in[s], stage_out[s], layers[s], stage_stride[s], res_scale[s],
                fused_in,
            )
            setattr(self, f"layer{s + 1}_dem", dem_l)
            if self.has_img:
                setattr(
                    self,
                    f"layer{s + 1}_img",
                    _make_branch_layer(
                        stage_in[s], stage_out[s], layers[s], stage_stride[s],
                        res_scale[s], stage_in[s],
                    ),
                )
            if self.aux_key:
                setattr(
                    self,
                    f"layer{s + 1}_aux",
                    _make_branch_layer(
                        stage_in[s], stage_out[s], layers[s], stage_stride[s],
                        res_scale[s], stage_in[s],
                    ),
                )
            setattr(
                self,
                f"guide{s + 1}",
                Guide(stage_out[s] * nb, stage_out[s], cat_only=cat_only),
            )

        c4_ch = nf * 16 * nb if cat_only else nf * 16
        self.layer3d = Basic2dTrans(c4_ch, nf * 8, camb=cat_only)
        c3_ch = nf * 8 + nf * 8 * nb if cat_only else nf * 8
        self.layer2d = Basic2dTrans(c3_ch, nf * 4, camb=cat_only)
        c2_ch = nf * 4 + nf * 4 * nb if cat_only else nf * 4
        self.layer1d = Basic2dTrans(c2_ch, nf * 2, camb=cat_only)
        c1_ch = nf * 2 + nf * 2 * nb if cat_only else nf * 2
        c0_ch = nf * 2 if cat_only else nf
        self.conv0 = Basic2d(c1_ch, c0_ch, 3, 1, bn=True, relu=True, camb=cat_only)

        bc = nf if cat_only else nf // 2
        if spn:
            self.generator = Generator(c0_ch, 3, bc=bc, leaky=generator_leaky)
            # spn_sample_dtype='bfloat16': opt-in bf16 image matmuls inside
            # the deformable sampling kernel (the compute_dtype split keeps
            # the sampling fp32 by default — see the note above; this option
            # trades sampled-value precision for the 4x bf16 MXU rate,
            # measured in PERF.md "bf16 deformable sampling")
            self.postprocessor = PostProcessor(3, residual=True,
                                               scale=spn_scale,
                                               sample_dtype=spn_sample_dtype)
        else:
            self.generator = None
            self.postprocessor = Basic2d(c0_ch, out_channels, 3, 1, bn=False,
                                         relu=False)

    # ------------------------------------------------------------------
    def input_keys(self):
        """Canonical input order: dem, then image, then the aux modality."""
        keys = ["lr_dem"]
        if self.has_img:
            keys.append("image")
        if self.aux_key:
            keys.append(self.aux_key)
        return keys

    def _fused_stems(self, params, state, ns, stems, cdt, train):
        """All stem convs as one block-diagonal 5x5 conv (exact arithmetic).

        The logical per-branch weights stay separate in the param tree;
        they are assembled into a block matrix at trace time (cheap copies,
        and gradients flow back through the slice assembly). BN (image stem
        only, reference JSPSR.py:66-87) and ReLU apply per output slice.
        """
        xs = jnp.concatenate([x.astype(cdt) for _, _, x in stems], axis=-1)
        nf = self.conv_dem.conv.out_channels
        cin_tot = xs.shape[-1]
        w = jnp.zeros((5, 5, cin_tot, nf * len(stems)), cdt)
        b = jnp.zeros((nf * len(stems),), cdt)
        ci = 0
        for i, (name, _, x) in enumerate(stems):
            conv_p = params[name]["conv"]
            w = w.at[:, :, ci:ci + x.shape[-1], i * nf:(i + 1) * nf].set(
                conv_p["w"].astype(cdt))
            if "b" in conv_p:
                b = b.at[i * nf:(i + 1) * nf].set(conv_p["b"].astype(cdt))
            ci += x.shape[-1]
        y = jax.lax.conv_general_dilated(
            xs, w, window_strides=(1, 1), padding=((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        feats = {}
        for i, (name, key, _) in enumerate(stems):
            sl = y[..., i * nf:(i + 1) * nf]
            mod = getattr(self, name)
            if mod.bn is not None:
                # tolerate partially-missing bn_state (shape-filtered load)
                # like the separate-stems path: fall back to init stats
                bn_s = state.get(name, {}).get("bn") or {
                    "mean": jnp.zeros((nf,), jnp.float32),
                    "var": jnp.ones((nf,), jnp.float32),
                }
                sl, s = mod.bn(params[name]["bn"], bn_s, sl, train=train)
                if s:
                    ns[name] = {"bn": s}
            feats[key] = jnp.maximum(sl, 0)
        return feats

    # -- eval-only grouped branch execution -----------------------------
    @staticmethod
    def _grouped_block(blocks, ps, ss, xs):
        """Run B same-shape BasicBlocks as one grouped-conv block.

        Exact arithmetic: group g of a feature_group_count=B conv sees
        exactly branch g's input slice with branch g's kernel — channel
        concat of inputs, kernel concat on the output axis. Eval BatchNorm
        is per-channel, so concatenated scale/bias/running-stats reproduce
        each branch's normalization bit-for-bit."""
        nb = len(blocks)
        blk = blocks[0]
        x = jnp.concatenate(xs, axis=-1)

        def gconv(key, xx, stride, pad):
            w = jnp.concatenate(
                [(p[key]["conv"]["w"] if "conv" in p.get(key, {})
                  else p[key]["w"]) for p in ps], axis=-1).astype(xx.dtype)
            return jax.lax.conv_general_dilated(
                xx, w, window_strides=stride, padding=(pad, pad),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=nb)

        def gbn(key, xx, eps, sub=None):
            def leaf(tree, *path):
                for k in path:
                    tree = tree[k]
                return tree

            pre = (key, "bn") if sub else (key,)
            scale = jnp.concatenate([leaf(p, *pre, "scale") for p in ps])
            bias = jnp.concatenate([leaf(p, *pre, "bias") for p in ps])
            mean = jnp.concatenate([leaf(s, *pre, "mean") for s in ss])
            var = jnp.concatenate([leaf(s, *pre, "var") for s in ss])
            inv = jax.lax.rsqrt(var + eps) * scale
            return (xx - mean.astype(xx.dtype)) * inv.astype(xx.dtype) \
                + bias.astype(xx.dtype)

        stride = blk.conv1.stride
        out = gconv("conv1", x, stride, (1, 1))
        out = gbn("bn1", out, blk.bn1.eps)
        out = jnp.maximum(out, 0)
        out = gconv("conv2", out, (1, 1), (1, 1))
        out = gbn("bn2", out, blk.bn2.eps)
        if blk.downsample is not None:
            res = gconv("downsample", x, stride, (0, 0))
            res = gbn("downsample", res, blk.downsample.bn.eps, sub="bn")
        else:
            res = x
        out = out * blk.scale + res
        if blk.act:
            out = jnp.maximum(out, 0)
        planes = blk.conv1.out_channels
        return [out[..., i * planes:(i + 1) * planes] for i in range(nb)]

    def _grouped_stage(self, params, state, stage, feats):
        """One encoder stage with same-shape branch blocks horizontally
        fused (see eval_grouped). Branch blocks whose input width differs
        (the DEM branch consumes the fused tensor at stages 2-4) run
        separately; the rest run grouped."""
        names = ["dem"] + (["img"] if self.has_img else []) \
            + (["aux"] if self.aux_key else [])
        seqs = {b: getattr(self, f"layer{stage}_{b}") for b in names}
        acts = dict(feats)
        for bi in range(len(seqs[names[0]].mods)):
            blocks = {b: seqs[b].mods[bi][1] for b in names}
            sig = {b: (blocks[b].conv1.in_channels, blocks[b].conv1.stride,
                       blocks[b].downsample is not None) for b in names}
            done = set()
            for b in names:
                if b in done:
                    continue
                grp = [g for g in names if g not in done and sig[g] == sig[b]]
                done.update(grp)
                if len(grp) == 1:
                    lname = f"layer{stage}_{b}"
                    acts[b], _ = blocks[b](
                        params[lname][str(bi)],
                        state.get(lname, {}).get(str(bi), {}),
                        acts[b], train=False)
                else:
                    outs = self._grouped_block(
                        [blocks[g] for g in grp],
                        [params[f"layer{stage}_{g}"][str(bi)] for g in grp],
                        [state.get(f"layer{stage}_{g}", {}).get(str(bi), {})
                         for g in grp],
                        [acts[g] for g in grp])
                    for g, y in zip(grp, outs):
                        acts[g] = y
        return acts

    def __call__(self, params, state, inputs, train: bool = False,
                 rng=None):
        """inputs: list/tuple of NHWC arrays in input_keys() order.
        rng accepted for interface uniformity (no stochastic layers)."""
        ns = {}

        def run(name, *args):
            mod = getattr(self, name)

            def f(p, s, *a):
                return mod(p, s, *a, train=train)

            if self.remat_stages and train and name.startswith(
                ("layer", "conv", "generator")
            ):
                f = jax.checkpoint(f)
            out, s = f(params.get(name, {}), state.get(name, {}), *args)
            if s:
                ns[name] = s
            return out

        keys = self.input_keys()
        assert len(inputs) == len(keys), (len(inputs), keys)
        dem = inputs[0]
        img = inputs[1] if self.has_img else None
        aux = inputs[-1] if self.aux_key else None

        cdt = self.compute_dtype
        stems = [("conv_dem", "dem", dem)]
        if self.has_img:
            stems.append(("conv_img", "img", img))
        if self.aux_key:
            stems.append(("conv_aux", "aux", aux))

        # under per-stage remat the separate path is used so the stem convs
        # get the run()-level jax.checkpoint (the fused helper mutates ns,
        # which does not compose with checkpointing)
        if self.fuse_stems and len(stems) > 1 and not (
            self.remat_stages and train
        ):
            feats = self._fused_stems(params, state, ns, stems, cdt, train)
        else:
            feats = {
                key: run(name, x.astype(cdt)) for name, key, x in stems
            }

        fused = {}
        dem_in = feats["dem"]
        grouped = (self.eval_grouped and not train and self.cat_only
                   and self.num_branch >= 2)
        for s in range(1, 5):
            if grouped:
                branch_out = self._grouped_stage(
                    params, state, s, {**feats, "dem": dem_in})
            else:
                branch_out = {"dem": run(f"layer{s}_dem", dem_in)}
                if self.has_img:
                    branch_out["img"] = run(f"layer{s}_img", feats["img"])
                if self.aux_key:
                    branch_out["aux"] = run(f"layer{s}_aux", feats["aux"])
            ordered = [branch_out["dem"]]
            if self.has_img:
                ordered.append(branch_out["img"])
            if self.aux_key:
                ordered.append(branch_out["aux"])
            fused[s] = run(f"guide{s}", ordered)
            feats = branch_out
            dem_in = fused[s]

        dc3 = run("layer3d", fused[4])
        c3 = (
            jnp.concatenate([dc3, fused[3]], axis=-1) if self.cat_only
            else dc3 + fused[3]
        )
        dc2 = run("layer2d", c3)
        c2 = (
            jnp.concatenate([dc2, fused[2]], axis=-1) if self.cat_only
            else dc2 + fused[2]
        )
        dc1 = run("layer1d", c2)
        c1 = (
            jnp.concatenate([dc1, fused[1]], axis=-1) if self.cat_only
            else dc1 + fused[1]
        )
        c0 = run("conv0", c1)

        if self.spn:
            # Gradient stop on the DEM input: the refinement head treats the
            # raw LR DEM as data, not as a learnable path (ref JSPSR.py:372).
            dem_sg = jax.lax.stop_gradient(dem)
            (weight, offset), s = self.generator(
                params["generator"], state.get("generator", {}),
                dem_sg.astype(cdt), c0, train=train,
            )
            if s:
                ns["generator"] = s
            # Deformable sampling of the raw DEM is precision-critical:
            # affinities/offsets re-enter fp32, the DEM itself never left it.
            output, _ = self.postprocessor(
                params["postprocessor"], {}, dem_sg,
                weight.astype(jnp.float32), offset.astype(jnp.float32),
                train=train,
            )
        else:
            output = run("postprocessor", c0).astype(jnp.float32)
        return output, ns
