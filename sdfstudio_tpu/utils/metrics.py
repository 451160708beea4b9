"""Image quality metrics (PSNR / SSIM) in pure jnp.

Replaces torchmetrics PSNR/SSIM (reference base_surface_model.py:233-236).
LPIPS requires pretrained VGG/Alex weights (unavailable offline); it is
reported when a weights file is provided, else omitted.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def ssim(
    pred: jnp.ndarray,  # [H, W, C] in [0, 1]
    target: jnp.ndarray,
    kernel_size: int = 11,
    sigma: float = 1.5,
    data_range: float = 1.0,
) -> jnp.ndarray:
    """Mean SSIM with gaussian window (standard formulation, matching
    torchmetrics structural_similarity_index_measure defaults)."""
    C = pred.shape[-1]
    x = jnp.moveaxis(pred, -1, 0)[None]  # [1, C, H, W]
    y = jnp.moveaxis(target, -1, 0)[None]
    k = jnp.asarray(_gaussian_window(kernel_size, sigma))[None, None]
    kernel = jnp.tile(k, (C, 1, 1, 1))

    def conv(v):
        return jax.lax.conv_general_dilated(
            v, kernel, window_strides=(1, 1), padding="VALID", feature_group_count=C
        )

    mu_x, mu_y = conv(x), conv(y)
    sigma_x = conv(x * x) - mu_x**2
    sigma_y = conv(y * y) - mu_y**2
    sigma_xy = conv(x * y) - mu_x * mu_y
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    num = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
    den = (mu_x**2 + mu_y**2 + C1) * (sigma_x + sigma_y + C2)
    return jnp.mean(num / den)
