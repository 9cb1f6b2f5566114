"""Import the read-only reference implementation as a *test oracle*.

The reference (at /root/reference) is PyTorch code that imports torchvision
(absent here); we stub `torchvision.ops.deform_conv2d` with our own
vectorized pure-torch implementation (itself validated against the numpy
golden) so the reference models can run forward on CPU for parity tests.

The reference code is never imported by the framework itself.
"""

import sys
import types

REF_PATH = "/root/reference"


def _install_torchvision_stub():
    if "torchvision" in sys.modules:
        return
    from tests.golden.deform_conv_torch import deform_conv2d

    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    ops.deform_conv2d = deform_conv2d
    tv.ops = ops

    # minimal transforms stub (data_utils imports torchvision.transforms)
    transforms = types.ModuleType("torchvision.transforms")

    class _ToTensor:
        def __call__(self, arr):
            import numpy as np
            import torch

            a = np.asarray(arr)
            if a.ndim == 2:
                a = a[:, :, None]
            t = torch.from_numpy(a.transpose(2, 0, 1).copy()).contiguous()
            if a.dtype == np.uint8:
                t = t.float().div(255.0)
            return t

    class _Normalize:
        def __init__(self, mean, std):
            self.mean, self.std = mean, std

        def __call__(self, t):
            import torch

            mean = torch.tensor(self.mean).view(-1, 1, 1)
            std = torch.tensor(self.std).view(-1, 1, 1)
            return (t - mean) / std

    transforms.ToTensor = _ToTensor
    transforms.Normalize = _Normalize
    tv.transforms = transforms

    # minimal torchvision.models.resnet34 (PVT uses only layer1/layer2)
    models = types.ModuleType("torchvision.models")

    def _resnet(layers_cfg):
        import torch
        import torch.nn as tnn

        class TVBasicBlock(tnn.Module):
            def __init__(self, cin, planes, stride=1, downsample=None):
                super().__init__()
                self.conv1 = tnn.Conv2d(cin, planes, 3, stride, 1, bias=False)
                self.bn1 = tnn.BatchNorm2d(planes)
                self.relu = tnn.ReLU(inplace=True)
                self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
                self.bn2 = tnn.BatchNorm2d(planes)
                self.downsample = downsample

            def forward(self, x):
                idt = x
                out = self.relu(self.bn1(self.conv1(x)))
                out = self.bn2(self.conv2(out))
                if self.downsample is not None:
                    idt = self.downsample(x)
                return self.relu(out + idt)

        def make_layer(cin, planes, blocks, stride):
            ds = None
            if stride != 1 or cin != planes:
                ds = tnn.Sequential(
                    tnn.Conv2d(cin, planes, 1, stride, bias=False),
                    tnn.BatchNorm2d(planes),
                )
            mods = [TVBasicBlock(cin, planes, stride, ds)]
            mods += [TVBasicBlock(planes, planes) for _ in range(blocks - 1)]
            return tnn.Sequential(*mods)

        net = types.SimpleNamespace()
        net.layer1 = make_layer(64, 64, layers_cfg[0], 1)
        net.layer2 = make_layer(64, 128, layers_cfg[1], 2)
        net.layer3 = make_layer(128, 256, layers_cfg[2], 2)
        net.layer4 = make_layer(256, 512, layers_cfg[3], 2)
        return net

    models.resnet34 = lambda weights=None, **kw: _resnet([3, 4, 6, 3])
    models.resnet18 = lambda weights=None, **kw: _resnet([2, 2, 2, 2])
    tv.models = models

    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.models"] = models

    # timm stub (pvt.py imports DropPath, to_2tuple, trunc_normal_)
    if "timm" not in sys.modules:
        import torch
        import torch.nn as tnn

        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        timm_layers = types.ModuleType("timm.models.layers")

        class DropPath(tnn.Module):
            def __init__(self, drop_prob=0.0):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):
                if not self.training or self.drop_prob == 0.0:
                    return x
                keep = 1 - self.drop_prob
                shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
                return x * mask / keep

        def to_2tuple(v):
            return v if isinstance(v, tuple) else (v, v)

        def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
            with torch.no_grad():
                tensor.normal_(mean, std).clamp_(a, b)
            return tensor

        timm_layers.DropPath = DropPath
        timm_layers.to_2tuple = to_2tuple
        timm_layers.trunc_normal_ = trunc_normal_
        timm_models.layers = timm_layers
        timm.models = timm_models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = timm_models
        sys.modules["timm.models.layers"] = timm_layers


def load_reference():
    """Make reference packages importable; returns nothing."""
    _install_torchvision_stub()
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    # reference pvt.py unconditionally torch.loads pretrained ResNet files
    # (pvt.py:19-34); route through the stub constructors instead.
    try:
        import torchvision
        import models.components.pvt as ref_pvt

        ref_pvt.get_resnet34 = lambda pretrained=True: torchvision.models.resnet34()
        ref_pvt.get_resnet18 = lambda pretrained=True: torchvision.models.resnet18()
    except Exception:
        pass


def ref_jspsr(**kwargs):
    load_reference()
    from models.JSPSR import Model

    return Model(**kwargs)


def ref_edsr(**kwargs):
    load_reference()
    from models.EDSR import EDSR

    return EDSR(**kwargs)
