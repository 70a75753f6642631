"""Photometric losses and image metrics (l1 / l2 / focal_l2 / SSIM / PSNR).

Behavior mirrors reference utils/loss_utils.py and eval.py metrics, written
as pure jnp. Images are channel-first ``[..., 3, H, W]`` like the reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - gt).mean()


def l2_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return ((pred - gt) ** 2).mean()


def focal_l2_loss(pred: jnp.ndarray, gt: jnp.ndarray, bg_color,
                  non_bg_rate: float, bg_rate: float) -> jnp.ndarray:
    """L2 with per-pixel reweighting: background pixels (gt == bg_color in
    all channels, atol 1e-6) get ``bg_rate``, others ``non_bg_rate``, both
    normalized so the mean weight of a 50/50 image is 1
    (reference utils/loss_utils.py:23-45).

    pred/gt: [B, 3, H, W]; bg_color: length-3.
    """
    bg = jnp.asarray(bg_color, dtype=gt.dtype).reshape(1, 3, 1, 1)
    base = (pred - gt) ** 2
    is_bg = jnp.all(jnp.abs(gt - bg) <= 1e-6, axis=1, keepdims=True)
    normed_non_bg = 2.0 * non_bg_rate / (bg_rate + non_bg_rate)
    normed_bg = 2.0 * bg_rate / (bg_rate + non_bg_rate)
    weights = jnp.where(is_bg, normed_bg, normed_non_bg)
    return (base * weights).mean()


def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("window_size", "size_average"))
def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         size_average: bool = True) -> jnp.ndarray:
    """SSIM with an 11x11 Gaussian window (sigma 1.5), same-padding depthwise
    convolution — matches reference utils/loss_utils.py:57-87.

    img1/img2: [..., C, H, W] (any leading batch dims).
    """
    lead = img1.shape[:-3]
    C, H, W = img1.shape[-3:]
    x1 = img1.reshape((-1, C, H, W))
    x2 = img2.reshape((-1, C, H, W))

    g1d = jnp.asarray(_gaussian_window(window_size, 1.5))
    window2d = jnp.outer(g1d, g1d)  # [k, k]
    # Depthwise conv: kernel [k, k] applied per channel. Fold channels into
    # batch so one conv handles it (maps well to XLA conv on TPU).
    kernel = window2d[None, None, :, :]  # [1, 1, k, k] (OIHW)
    pad = window_size // 2

    def dconv(x):
        xb = x.reshape((-1, 1, H, W))
        y = jax.lax.conv_general_dilated(
            xb, kernel, window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return y.reshape((-1, C, H, W))

    mu1 = dconv(x1)
    mu2 = dconv(x2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = dconv(x1 * x1) - mu1_sq
    sigma2_sq = dconv(x2 * x2) - mu2_sq
    sigma12 = dconv(x1 * x2) - mu1_mu2

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    if size_average:
        return ssim_map.mean()
    return ssim_map.mean(axis=(1, 2, 3)).reshape(lead)


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """PSNR in dB over the full tensor (images in [0, 1])."""
    mse = jnp.mean((pred - gt) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
