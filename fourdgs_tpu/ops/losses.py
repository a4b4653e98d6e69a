"""Photometric losses and image metrics: L1/L2, SSIM, MS-SSIM, PSNR.

Behavioral contract from ref utils/loss_utils.py (windowed SSIM, 11x11
Gaussian sigma=1.5, zero padding) and utils/image_utils.py (per-image PSNR).
Images here are (..., H, W, C) channels-last float32 in [0, 1].
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - gt).mean()


def l2_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return ((pred - gt) ** 2).mean()


def psnr(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-image PSNR over leading batch dim; (B, H, W, C) -> (B,).

    Matches ref utils/image_utils.py:17-38 (mean over all pixels+channels
    of each image, 20*log10(1/sqrt(mse)))."""
    if pred.ndim == 3:
        pred, gt = pred[None], gt[None]
        if mask is not None:
            mask = mask[None]
    b = pred.shape[0]
    diff2 = (pred - gt) ** 2
    if mask is not None:
        m = (mask != 0).reshape(b, -1)
        diff2 = diff2.reshape(b, -1)
        mse = (diff2 * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1)
    else:
        mse = diff2.reshape(b, -1).mean(axis=1)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))


def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _depthwise_conv2d(img: jnp.ndarray, kernel: jnp.ndarray, padding) -> jnp.ndarray:
    """img (B, H, W, C), kernel (kh, kw) applied per channel.

    precision=HIGHEST is load-bearing: TPU convs default to bf16
    multiplies, and SSIM's variance terms are catastrophic cancellations
    (E[x^2] - mu^2 ~ 1e-3 on near-white images vs ~4e-3 bf16 error) —
    with the default precision, device-side SSIM came out > 3."""
    c = img.shape[-1]
    k = jnp.broadcast_to(kernel[:, :, None, None], kernel.shape + (1, c))
    return jax.lax.conv_general_dilated(
        img, k, window_strides=(1, 1), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("window_size", "size_average"))
def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         size_average: bool = True) -> jnp.ndarray:
    """Windowed SSIM with zero ('same') padding, matching the reference's
    torch conv2d(padding=window_size//2) semantics (utils/loss_utils.py:36-66).
    Accepts (H, W, C) or (B, H, W, C)."""
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
    w1d = jnp.asarray(_gaussian_window(window_size, 1.5))
    window = w1d[:, None] * w1d[None, :]
    pad = window_size // 2
    padding = [(pad, pad), (pad, pad)]

    mu1 = _depthwise_conv2d(img1, window, padding)
    mu2 = _depthwise_conv2d(img2, window, padding)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_conv2d(img1 * img1, window, padding) - mu1_sq
    sigma2_sq = _depthwise_conv2d(img2 * img2, window, padding) - mu2_sq
    sigma12 = _depthwise_conv2d(img1 * img2, window, padding) - mu1_mu2

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    if size_average:
        return ssim_map.mean()
    return ssim_map.mean(axis=(1, 2, 3))


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _ssim_and_cs(img1, img2, window_size=11):
    """SSIM mean and contrast-sensitivity mean with valid padding (the
    pytorch_msssim convention used by ref metrics.py)."""
    w1d = jnp.asarray(_gaussian_window(window_size, 1.5))
    window = w1d[:, None] * w1d[None, :]
    padding = "VALID"
    mu1 = _depthwise_conv2d(img1, window, padding)
    mu2 = _depthwise_conv2d(img2, window, padding)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_conv2d(img1 * img1, window, padding) - mu1_sq
    sigma2_sq = _depthwise_conv2d(img2 * img2, window, padding) - mu2_sq
    sigma12 = _depthwise_conv2d(img1 * img2, window, padding) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    return ssim_map.mean(axis=(1, 2, 3)), cs_map.mean(axis=(1, 2, 3))


def _avg_pool2(img):
    return jax.lax.reduce_window(
        img, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0


def ms_ssim(img1: jnp.ndarray, img2: jnp.ndarray, levels: int = 5) -> jnp.ndarray:
    """Multi-scale SSIM (Wang et al. 2003 weights), per-image over batch."""
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
    weights = _MSSSIM_WEIGHTS[:levels]
    mcs = []
    val = None
    for i in range(levels):
        s, cs = _ssim_and_cs(img1, img2)
        if i == levels - 1:
            val = jnp.maximum(s, 0.0)
        else:
            mcs.append(jnp.maximum(cs, 0.0))
            img1, img2 = _avg_pool2(img1), _avg_pool2(img2)
    out = val ** weights[-1]
    for w, cs in zip(weights[:-1], mcs):
        out = out * cs ** w
    return out


def d_ssim(img1, img2):
    """D-SSIM = (1 - MS-SSIM)/2 (ref metrics.py:79)."""
    return (1.0 - ms_ssim(img1, img2)) / 2.0
