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
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.transforms"] = transforms


def load_reference():
    """Make reference packages importable; returns nothing."""
    _install_torchvision_stub()
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)


def ref_jspsr(**kwargs):
    load_reference()
    from models.JSPSR import Model

    return Model(**kwargs)


def ref_edsr(**kwargs):
    load_reference()
    from models.EDSR import EDSR

    return EDSR(**kwargs)
