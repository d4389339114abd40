"""Differentiable SSIM (structural similarity) for training losses.

The reference's scenes are trained by splatfacto with loss
(1−λ)·L1 + λ·(1−SSIM), λ = ``ssim_lambda`` = 0.2
(assets/divar113vhw/splatfacto/2025-06-03_191520/config.yml:207); the
SSIM is torchmetrics' StructuralSimilarityIndexMeasure with the standard
11×11 Gaussian window (σ = 1.5), data_range 1.0, and K = (0.01, 0.03).
This is the jnp equivalent: separable depthwise Gaussian filtering
(VALID padding, as torchmetrics computes it), fully differentiable, used
by splat/train.py.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def _gaussian_kernel(size: int, sigma: float) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _blur(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise Gaussian filter, VALID padding.

    ``img`` is (H, W, C); returns (H−size+1, W−size+1, C)."""
    C = img.shape[-1]
    size = kernel.shape[0]
    x = img[None]                                            # NHWC
    kh = jnp.tile(kernel.reshape(size, 1, 1, 1), (1, 1, 1, C))
    kw = jnp.tile(kernel.reshape(1, size, 1, 1), (1, 1, 1, C))
    dn = lax.conv_dimension_numbers(x.shape, kh.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    x = lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                 dimension_numbers=dn, feature_group_count=C)
    x = lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                 dimension_numbers=dn, feature_group_count=C)
    return x[0]


def ssim(img: jnp.ndarray, ref: jnp.ndarray, kernel_size: int = 11,
         sigma: float = 1.5, data_range: float = 1.0,
         k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """Mean SSIM between two (H, W, C) images in [0, data_range].

    Matches the torchmetrics/splatfacto computation (gaussian 11×11 window,
    per-pixel SSIM map averaged over the VALID region and channels).
    """
    kernel = jnp.asarray(_gaussian_kernel(kernel_size, sigma))
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_x = _blur(img, kernel)
    mu_y = _blur(ref, kernel)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_x = _blur(img * img, kernel) - mu_xx
    sigma_y = _blur(ref * ref, kernel) - mu_yy
    sigma_xy = _blur(img * ref, kernel) - mu_xy
    num = (2.0 * mu_xy + c1) * (2.0 * sigma_xy + c2)
    den = (mu_xx + mu_yy + c1) * (sigma_x + sigma_y + c2)
    return jnp.mean(num / den)


def ssim_loss(img: jnp.ndarray, ref: jnp.ndarray, **kw) -> jnp.ndarray:
    """1 − SSIM, the splatfacto loss term."""
    return 1.0 - ssim(img, ref, **kw)
