"""Rendering losses for the Gaussian-SLAM tier.

Reference behavior: /root/reference/ovo/submodules/gaussian_slam/entities/
losses.py:8-141 (l1 with mean/sum/none aggregation, windowed SSIM, isotropic
scale regularizer). Implemented as pure jnp functions; SSIM's separable
gaussian blur runs as two depthwise convs so XLA fuses it into the backward
pass of the mapping loop.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def l1_loss(pred: Array, gt: Array, agg: str = "mean") -> Array:
    d = jnp.abs(pred - gt)
    if agg == "mean":
        return d.mean()
    if agg == "sum":
        return d.sum()
    return d


def _gaussian_window(size: int, sigma: float) -> Array:
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / g.sum()


def _blur(img: Array, win: Array) -> Array:
    """Separable gaussian blur of (H, W, C) with SAME padding."""
    size = win.shape[0]
    c = img.shape[-1]
    x = img.transpose(2, 0, 1)[:, None]  # (C, 1, H, W)
    kh = win.reshape(1, 1, size, 1)
    kw = win.reshape(1, 1, 1, size)
    x = jax.lax.conv_general_dilated(x, jnp.tile(kh, (1, 1, 1, 1)),
                                     (1, 1), "SAME")
    x = jax.lax.conv_general_dilated(x, jnp.tile(kw, (1, 1, 1, 1)),
                                     (1, 1), "SAME")
    return x[:, 0].transpose(1, 2, 0)


@functools.partial(jax.jit, static_argnames=("window_size",))
def ssim(img1: Array, img2: Array, window_size: int = 11) -> Array:
    """Mean SSIM over an (H, W, C) pair (reference losses.py windowed SSIM)."""
    win = _gaussian_window(window_size, 1.5)
    mu1 = _blur(img1, win)
    mu2 = _blur(img2, win)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1 = _blur(img1 * img1, win) - mu1_sq
    sigma2 = _blur(img2 * img2, win) - mu2_sq
    sigma12 = _blur(img1 * img2, win) - mu12
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    s = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1 + sigma2 + c2))
    return s.mean()


def psnr(pred: Array, gt: Array, mask: Array | None = None) -> Array:
    """Peak signal-to-noise ratio over [0,1] images (reference
    mapper_utils.py PSNR, logged per mapped keyframe mapper.py:244-256)."""
    err = (pred - gt) ** 2
    if mask is not None:
        mse = jnp.where(mask[..., None], err, 0.0).sum() / jnp.maximum(
            mask.sum() * pred.shape[-1], 1)
    else:
        mse = err.mean()
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def isotropic_loss(scales_log: Array, valid: Array) -> Array:
    """Penalize anisotropic gaussians (reference losses.py isotropic reg):
    mean |scale - mean(scale)| per gaussian, over valid slots."""
    s = jnp.exp(scales_log)
    dev = jnp.abs(s - s.mean(axis=-1, keepdims=True)).mean(axis=-1)
    n = jnp.maximum(valid.sum(), 1)
    return jnp.where(valid, dev, 0.0).sum() / n
