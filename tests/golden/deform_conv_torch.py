"""Vectorized pure-torch modulated deformable conv (test oracle only).

Drop-in signature-compatible with torchvision.ops.deform_conv2d so it can
back a `torchvision` stub when importing the reference model for parity
tests (torchvision is not installed in this environment).
"""

import torch


def deform_conv2d(
    input, offset, weight, bias=None, stride=(1, 1), padding=(0, 0),
    dilation=(1, 1), mask=None,
):
    def _pair(v):
        return (v, v) if isinstance(v, int) else tuple(v)

    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    b, cin, h, w = input.shape
    cout, _, kh, kw = weight.shape
    k = kh * kw
    _, _, ho, wo = offset.shape

    dev, dt = input.device, input.dtype
    oy = torch.arange(ho, device=dev, dtype=dt) * sh - ph
    ox = torch.arange(wo, device=dev, dtype=dt) * sw - pw
    ky = torch.arange(kh, device=dev, dtype=dt) * dh
    kx = torch.arange(kw, device=dev, dtype=dt) * dw
    tap_y = ky.repeat_interleave(kw)  # (K,)
    tap_x = kx.repeat(kh)

    off = offset.reshape(b, k, 2, ho, wo)
    py = oy.view(1, 1, ho, 1) + tap_y.view(1, k, 1, 1) + off[:, :, 0]
    px = ox.view(1, 1, 1, wo) + tap_x.view(1, k, 1, 1) + off[:, :, 1]
    # (B, K, Ho, Wo)

    y0 = torch.floor(py)
    x0 = torch.floor(px)
    ty = py - y0
    tx = px - x0

    flat_in = input.reshape(b, cin, h * w)

    def corner(yc, xc):
        valid = (yc >= 0) & (yc <= h - 1) & (xc >= 0) & (xc <= w - 1)
        yi = yc.clamp(0, h - 1).long()
        xi = xc.clamp(0, w - 1).long()
        idx = (yi * w + xi).reshape(b, 1, -1).expand(b, cin, -1)
        g = torch.gather(flat_in, 2, idx).reshape(b, cin, k, ho, wo)
        return g * valid.unsqueeze(1).to(dt)

    v00 = corner(y0, x0)
    v01 = corner(y0, x0 + 1)
    v10 = corner(y0 + 1, x0)
    v11 = corner(y0 + 1, x0 + 1)
    wy0, wy1 = (1 - ty).unsqueeze(1), ty.unsqueeze(1)
    wx0, wx1 = (1 - tx).unsqueeze(1), tx.unsqueeze(1)
    cols = wy0 * (wx0 * v00 + wx1 * v01) + wy1 * (wx0 * v10 + wx1 * v11)
    if mask is not None:
        cols = cols * mask.unsqueeze(1)

    out = torch.einsum("bckhw,ock->bohw", cols, weight.reshape(cout, cin, k))
    if bias is not None:
        out = out + bias.view(1, cout, 1, 1)
    return out
