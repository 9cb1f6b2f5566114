"""Independent numpy golden model of modulated deformable convolution.

Slow scalar-loop implementation of the DCNv2 semantics (as defined in the
Deformable ConvNets v2 paper and torchvision.ops.deform_conv2d), used only as
a test oracle for the XLA/Pallas kernels. NCHW layouts like torch, so it can
double as a drop-in check against torchvision where available.
"""

import numpy as np


def bilinear(img, y, x):
    """Sample img (H, W) at float position (y, x) with zero padding."""
    h, w = img.shape
    if y <= -1 or y >= h or x <= -1 or x >= w:
        return 0.0
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    ty, tx = y - y0, x - x0
    v = 0.0
    for dy, wy in ((0, 1 - ty), (1, ty)):
        for dx, wx in ((0, 1 - tx), (1, tx)):
            yy, xx = y0 + dy, x0 + dx
            if 0 <= yy < h and 0 <= xx < w:
                v += wy * wx * img[yy, xx]
    return v


def deform_conv2d_np(
    x, offset, weight, bias=None, mask=None, stride=1, padding=1, dilation=1
):
    """x: (B,Cin,H,W); offset: (B,2K,Ho,Wo); weight: (Cout,Cin,kh,kw);
    mask: (B,K,Ho,Wo). Returns (B,Cout,Ho,Wo)."""
    b, cin, h, w = x.shape
    cout, _, kh, kw = weight.shape
    _, _, ho, wo = offset.shape
    k = kh * kw
    out = np.zeros((b, cout, ho, wo), np.float64)
    for bi in range(b):
        for oy in range(ho):
            for ox in range(wo):
                for i in range(kh):
                    for j in range(kw):
                        t = i * kw + j
                        py = oy * stride - padding + i * dilation + offset[bi, 2 * t, oy, ox]
                        px = ox * stride - padding + j * dilation + offset[bi, 2 * t + 1, oy, ox]
                        m = mask[bi, t, oy, ox] if mask is not None else 1.0
                        for ci in range(cin):
                            v = bilinear(x[bi, ci], py, px)
                            out[bi, :, oy, ox] += weight[:, ci, i, j] * (m * v)
    if bias is not None:
        out += bias[None, :, None, None]
    return out.astype(np.float32)
