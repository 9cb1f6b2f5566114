"""Loss functions (reference losses/loss_functions.py), pure jnp.

All take NHWC (pred, gt) and return a scalar. Differentiable, jittable;
composed inside the jitted train step so XLA fuses them with the backward
pass (no separate kernel launches as in the torch reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jspsr_tpu.ops.filters import spatial_gradient, ssim


def l1_loss(pred, gt):
    return jnp.mean(jnp.abs(pred - gt))


def l2_loss(pred, gt):
    return jnp.mean(jnp.square(pred - gt))


def edge_loss(pred, gt):
    """L1 between normalized-sobel gradients ('Grad' in shipped configs;
    reference loss_functions.py:171-185)."""
    px, py = spatial_gradient(pred)
    gx, gy = spatial_gradient(gt)
    return 0.5 * (jnp.mean(jnp.abs(px - gx)) + jnp.mean(jnp.abs(py - gy)))


def charbonnier_loss(pred, gt, eps: float = 1e-9):
    d = pred - gt
    return jnp.mean(jnp.sqrt(d * d + eps))


def berhu_loss(pred, gt, delta: float = 0.6):
    """Reversed Huber; threshold = delta * max|err| (stop-gradient, matching
    the reference's .item() detach at loss_functions.py:197)."""
    diff = jnp.abs(pred - gt)
    th = jax.lax.stop_gradient(delta * jnp.max(diff))
    return jnp.mean(jnp.where(diff <= th, diff, (diff**2 + th**2) / (2 * th)))


def tv_loss(pred, gt=None, weight: float = 1.0):
    """Total variation (reference loss_functions.py:126-149). gt ignored."""
    x = pred
    b = x.shape[0]
    h_tv = jnp.sum(jnp.square(x[:, 1:] - x[:, :-1]))
    w_tv = jnp.sum(jnp.square(x[:, :, 1:] - x[:, :, :-1]))
    count_h = x[:, 1:].size // b
    count_w = x[:, :, 1:].size // b
    return weight * 2 * (h_tv / count_h + w_tv / count_w) / b


def surface_normal_loss(pred, gt):
    """1 - cosine similarity over the channel axis (loss_functions.py:211-226)."""
    eps = 1e-12
    pn = pred / jnp.maximum(jnp.linalg.norm(pred, axis=-1, keepdims=True), eps)
    gn = gt / jnp.maximum(jnp.linalg.norm(gt, axis=-1, keepdims=True), eps)
    return jnp.mean(1.0 - jnp.sum(pn * gn, axis=-1))


def ssim_loss(pred, gt):
    """1 - SSIM (reference loss_functions.py:232-239; piq semantics:
    gaussian 11/1.5, valid padding, data_range 1)."""
    return 1.0 - ssim(jnp.clip(pred, 0.0, 1.0), gt, padding="valid")


def bce_with_logits_loss(pred, gt):
    return jnp.mean(
        jnp.maximum(pred, 0) - pred * gt + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    )


def softmax_ce_loss(pred, label, ignore_index: int = 255):
    """Semantic-seg cross entropy with ignore label (reference
    loss_functions.py:11-28). pred NHWC logits; label NHW1 or NHW ints."""
    label = jnp.squeeze(label, -1) if label.ndim == pred.ndim else label
    label = label.astype(jnp.int32)
    valid = (label != ignore_index)
    logp = jax.nn.log_softmax(pred, axis=-1)
    safe = jnp.where(valid, label, 0)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)


def balanced_bce_loss(pred, gt, pos_weight=None):
    """HED-style class-balanced BCE-with-logits (reference
    loss_functions.py:31-80), size-averaged."""
    labels = (gt >= 0.5).astype(pred.dtype)
    if pos_weight is None:
        n_pos = jnp.sum(labels)
        n_neg = jnp.sum(1.0 - labels)
        w = n_neg / jnp.maximum(n_pos + n_neg, 1.0)
    else:
        w = pos_weight
    gt0 = (pred >= 0).astype(pred.dtype)
    loss_val = pred * (labels - gt0) - jnp.log1p(
        jnp.exp(pred - 2.0 * pred * gt0)
    )
    loss_pos = -jnp.sum(labels * loss_val)
    loss_neg = -jnp.sum((1.0 - labels) * loss_val)
    return (w * loss_pos + (1.0 - w) * loss_neg) / gt.size


_REGISTRY = {
    "l1": l1_loss,
    "l2": l2_loss,
    "mse": l2_loss,
    "edge": edge_loss,
    "grad": edge_loss,
    "charbonnier": charbonnier_loss,
    "berhu": berhu_loss,
    "tv": tv_loss,
    "norm": surface_normal_loss,
    "ssim": ssim_loss,
    "vanilla": bce_with_logits_loss,
    "bce": bce_with_logits_loss,
    "softmax": softmax_ce_loss,
    "balanced_bce": balanced_bce_loss,
}


def get_loss(name: str):
    """Name-keyed loss registry (reference losses/loss_schemes.py:6-33)."""
    key = name.lower()
    if key not in _REGISTRY:
        raise NotImplementedError(f"Undefined loss: {name}")
    return _REGISTRY[key]
