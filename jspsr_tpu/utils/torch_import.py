"""PyTorch checkpoint importer.

Maps a reference-style torch ``state_dict`` (numpy arrays or torch tensors)
onto this framework's (params, state) pytrees, handling:

- name mapping (torch nn.Sequential indices vs our named children),
- layout transposes: conv OIHW -> HWIO; transposed conv (IOHW + spatial flip)
  -> equivalent-forward-conv HWIO,
- BatchNorm running stats -> the ``state`` tree.

Needed for the fp32 forward-parity gate against reference checkpoints
(reference checkpoint format: utils/utils.py:373-407 'state_dict' entry).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from jspsr_tpu import nn
from jspsr_tpu.nn.module import ParamLeaf
from jspsr_tpu.models import components as C
from jspsr_tpu.models import spn as S
from jspsr_tpu.models import edsr as E
from jspsr_tpu.models import lrru as L
from jspsr_tpu.models import nlspn as N
from jspsr_tpu.models import pvt as P


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


class _Collector:
    def __init__(self, sd, missing_ok: bool = False):
        self.sd = {k: _np(v) for k, v in sd.items()}
        self.params = {}
        self.state = {}
        self.used = set()
        self.missing_ok = missing_ok

    def get(self, name):
        self.used.add(name)
        return self.sd[name]

    def set_param(self, jpath, value):
        d = self.params
        for k in jpath[:-1]:
            d = d.setdefault(k, {})
        d[jpath[-1]] = jnp.asarray(value)

    def set_state(self, jpath, value):
        d = self.state
        for k in jpath[:-1]:
            d = d.setdefault(k, {})
        d[jpath[-1]] = jnp.asarray(value)


def _join(t, name):
    return f"{t}.{name}" if t else name


def _map_module(mod, jpath, tname, col: _Collector):
    """Recursively copy torch tensors for module ``mod`` rooted at torch
    name ``tname`` into the collector at json path ``jpath``.

    With ``col.missing_ok`` (the strict=False pretrained-bootstrap mode,
    reference completion_former_backbone.py:84-86 ``load_state_dict(...,
    strict=False)``), a missing torch key skips the smallest enclosing
    submodule and leaves its initialization untouched."""
    if col.missing_ok:
        try:
            return _map_module_strict(mod, jpath, tname, col)
        except KeyError:
            return None
    return _map_module_strict(mod, jpath, tname, col)


def _map_module_strict(mod, jpath, tname, col: _Collector):
    if isinstance(mod, nn.Conv2d):
        w = col.get(tname + ".weight")  # OIHW
        col.set_param(jpath + ("w",), w.transpose(2, 3, 1, 0))
        if mod.use_bias:
            col.set_param(jpath + ("b",), col.get(tname + ".bias"))
    elif isinstance(mod, nn.ConvTranspose2d):
        w = col.get(tname + ".weight")  # (cin, cout, kh, kw)
        w = np.flip(w, axis=(2, 3)).transpose(2, 3, 0, 1).copy()
        col.set_param(jpath + ("w",), w)
        if mod.use_bias:
            col.set_param(jpath + ("b",), col.get(tname + ".bias"))
    elif isinstance(mod, nn.BatchNorm2d):
        col.set_param(jpath + ("scale",), col.get(tname + ".weight"))
        col.set_param(jpath + ("bias",), col.get(tname + ".bias"))
        col.set_state(jpath + ("mean",), col.get(tname + ".running_mean"))
        col.set_state(jpath + ("var",), col.get(tname + ".running_var"))
    elif isinstance(mod, C.ChannelAttention):
        _map_module(mod.fc1, jpath + ("fc1",), _join(tname, "fc.0"), col)
        _map_module(mod.fc2, jpath + ("fc2",), _join(tname, "fc.2"), col)
    elif isinstance(mod, C.Basic2d):
        if mod.camb is not None:
            _map_module(mod.camb, jpath + ("camb",), _join(tname, "camb"), col)
        _map_module(mod.conv, jpath + ("conv",), _join(tname, "conv.0"), col)
        if mod.bn is not None:
            _map_module(mod.bn, jpath + ("bn",), _join(tname, "conv.bn"), col)
    elif isinstance(mod, C.Basic2dTrans):
        _map_module(mod.conv, jpath + ("conv",), _join(tname, "dconv.0"), col)
        _map_module(mod.dconv, jpath + ("dconv",), _join(tname, "dconv.1"), col)
        if mod.bn is not None:
            _map_module(mod.bn, jpath + ("bn",), _join(tname, "dconv.bn"), col)
    elif isinstance(mod, C.Downsample):
        _map_module(mod.conv, jpath + ("conv",), _join(tname, "0"), col)
        _map_module(mod.bn, jpath + ("bn",), _join(tname, "1"), col)
    elif isinstance(mod, S.Generator):
        for name, child in mod.children():
            if name == "conv_weight":
                _map_module(child, jpath + (name,), _join(tname, "conv_weight.0"),
                            col)
            else:
                _map_module(child, jpath + (name,), _join(tname, name), col)
    elif isinstance(mod, S.PostProcessor):
        w = col.get(tname + ".w")  # (1, 1, kh, kw)
        col.set_param(jpath + ("w",), w.transpose(2, 3, 1, 0))
        col.set_param(jpath + ("b",), col.get(tname + ".b"))
    elif isinstance(mod, nn.Dense):
        w = col.get(tname + ".weight")  # (out, in)
        col.set_param(jpath + ("w",), w.T)
        if mod.use_bias:
            col.set_param(jpath + ("b",), col.get(tname + ".bias"))
    elif isinstance(mod, nn.LayerNorm):
        col.set_param(jpath + ("scale",), col.get(tname + ".weight"))
        col.set_param(jpath + ("bias",), col.get(tname + ".bias"))
    elif isinstance(mod, ParamLeaf):
        col.set_param(jpath + ("value",), col.get(tname))
    elif isinstance(mod, N.NLSPN):
        _map_module(mod.conv_offset_aff, jpath + ("conv_offset_aff",),
                    _join(tname, "conv_offset_aff"), col)
        col.set_param(jpath + ("aff_scale_const", "value"),
                      col.get(_join(tname, "aff_scale_const")))
        col.set_param(jpath + ("w", "value"),
                      col.get(_join(tname, "w")).transpose(2, 3, 1, 0))
        col.set_param(jpath + ("b", "value"), col.get(_join(tname, "b")))
        col.set_param(jpath + ("w_conf", "value"),
                      col.get(_join(tname, "w_conf")).transpose(2, 3, 1, 0))
    elif isinstance(mod, L.LBasic2d):
        _map_module(mod.conv, jpath + ("conv",), _join(tname, "conv.0"), col)
        if mod.bn is not None:
            _map_module(mod.bn, jpath + ("bn",), _join(tname, "conv.bn"), col)
    elif isinstance(mod, L.LBasic2dTrans):
        _map_module(mod.conv, jpath + ("conv",), _join(tname, "conv"), col)
        _map_module(mod.bn, jpath + ("bn",), _join(tname, "bn"), col)
    elif isinstance(mod, L.LDownsample):
        _map_module(mod.conv, jpath + ("conv",), _join(tname, "0"), col)
        _map_module(mod.bn, jpath + ("bn",), _join(tname, "1"), col)
    elif isinstance(mod, L.PostProcess):
        w = col.get(tname + ".w")
        col.set_param(jpath + ("w",), w.transpose(2, 3, 1, 0))
        col.set_param(jpath + ("b",), col.get(tname + ".b"))
    elif isinstance(mod, E.ResBlock):
        _map_module(mod.conv1, jpath + ("conv1",), _join(tname, "body.0"), col)
        _map_module(mod.conv2, jpath + ("conv2",), _join(tname, "body.2"), col)
    elif isinstance(mod, E.Upscaler):
        _map_module(mod.conv1, jpath + ("conv1",), _join(tname, "0"), col)
    elif isinstance(mod, nn.Sequential):
        for name, child in mod.children():
            _map_module(child, jpath + (name,), _join(tname, name), col)
    else:
        # generic composite: attribute names match torch module names
        for name, child in mod.children():
            _map_module(child, jpath + (name,), _join(tname, name), col)


def expected_torch_keys(module):
    """The torch state_dict key order this module's importer consumes."""
    expected = []

    class _Recorder(dict):
        def __getitem__(self, key):
            expected.append(key)
            return np.zeros((1, 1, 1, 1), np.float32)  # transpose-safe dummy

    col = _Collector({})
    col.sd = _Recorder()
    _map_module(module, (), "", col)
    return expected


def pair_state_dict(module, foreign_state_dict):
    """Positional re-keying of a FOREIGN torch checkpoint (reference
    utils/utils.py:324-349): tensors are matched to this module's torch-name
    order purely by position, for pretrained files whose module names differ
    (e.g. the public EDSR weights). Returns a state_dict usable with
    import_torch_state_dict."""
    expected = expected_torch_keys(module)
    values = [v for k, v in foreign_state_dict.items()
              if not str(k).endswith("num_batches_tracked")]
    assert len(values) >= len(expected), (
        f"foreign checkpoint has {len(values)} tensors, need {len(expected)}"
    )
    return dict(zip(expected, values))


def load_torch_checkpoint(path):
    """Load a reference-format .pt/.pth checkpoint file (reference saves
    {'optimizer','state_dict','scheduler','epoch','best_result'},
    main.py:244-255) and return (state_dict, meta). Requires torch."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "state_dict" in blob:
        meta = {k: blob.get(k) for k in ("epoch", "best_result")}
        return blob["state_dict"], meta
    return blob, {}


def import_torch_state_dict(module, state_dict, strict: bool = True,
                            missing_ok: bool = False):
    """Returns (params, state) pytrees for ``module`` from a torch state_dict.

    missing_ok=True builds a PARTIAL pytree covering only the keys present —
    the reference's strict=False pretrained bootstrap
    (completion_former_backbone.py:84-86); merge it with merge_pytree."""
    col = _Collector(state_dict, missing_ok=missing_ok)
    _map_module(module, (), "", col)
    if strict and not missing_ok:
        unused = {
            k for k in col.sd if k not in col.used
            and not k.endswith("num_batches_tracked")
        }
        if unused:
            raise KeyError(f"unused torch keys: {sorted(unused)[:10]} "
                           f"({len(unused)} total)")
    return col.params, col.state


def merge_pytree(base, new, _path=""):
    """Merge a (possibly partial) imported pytree into ``base``, skipping
    leaves whose shapes don't match (the reference's shape-filtered
    state-dict update, utils/utils.py:352-370). Returns (merged, skipped)."""
    skipped = []

    def rec(b, n, path):
        out = dict(b)
        for k, v in n.items():
            here = f"{path}/{k}" if path else str(k)
            if k not in b:
                skipped.append(here)
            elif isinstance(v, dict):
                out[k] = rec(b[k], v, here)
            elif getattr(b[k], "shape", None) == getattr(v, "shape", None):
                out[k] = v
            else:
                skipped.append(here)
        return out

    return rec(base, new, _path), skipped
