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


# ---------------------------------------------------------------------------
# LPIPS (reference base_surface_model.py:233-236 uses torchmetrics LPIPS
# with pretrained VGG weights). Pretrained weights cannot be downloaded in
# a zero-egress deployment, so the metric runs only when a weights file is
# supplied — the NETWORK (VGG16 conv stack + LPIPS linear heads) is
# implemented here in jnp and the weights load from an .npz.
# ---------------------------------------------------------------------------

# VGG16 conv plan: (out_channels, stage); features are tapped after the
# ReLU closing each stage (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3).
_VGG16_PLAN = [
    (64, 0), (64, 0),
    (128, 1), (128, 1),
    (256, 2), (256, 2), (256, 2),
    (512, 3), (512, 3), (512, 3),
    (512, 4), (512, 4), (512, 4),
]
# input normalization constants from the published LPIPS implementation
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def load_lpips_weights(path):
    """Load LPIPS weights from an .npz with keys conv{i}_w [kh,kw,cin,cout],
    conv{i}_b [cout] for i in 0..12 and lin{s} [c_s] for s in 0..4."""
    data = np.load(path)
    convs = [
        (jnp.asarray(data[f"conv{i}_w"]), jnp.asarray(data[f"conv{i}_b"]))
        for i in range(len(_VGG16_PLAN))
    ]
    lins = [jnp.asarray(data[f"lin{s}"]) for s in range(5)]
    return convs, lins


def lpips_metric_name(path) -> str:
    """Metric-column name for a weights file: canonical trained LPIPS
    weights report as "lpips"; files stamped ``canonical=0`` (e.g. the
    deterministic random-feature weights from
    scripts/make_lpips_weights.py) report as "lpips_rand" so the
    non-canonical metric can never be mistaken for published LPIPS."""
    data = np.load(path)
    if "canonical" in data.files and int(np.asarray(data["canonical"])) == 0:
        return "lpips_rand"
    return "lpips"


def lpips(
    pred: jnp.ndarray,  # [H, W, 3] in [0, 1]
    target: jnp.ndarray,
    weights=None,
    weights_path: str | None = None,
):
    """LPIPS(VGG) distance; returns None when no weights are available
    (offline deployments). ``weights`` is the tuple from
    :func:`load_lpips_weights`; ``weights_path`` (or env
    ``SST_LPIPS_WEIGHTS``) loads it lazily."""
    import os

    if weights is None:
        path = weights_path or os.environ.get("SST_LPIPS_WEIGHTS")
        if not path:
            return None
        weights = load_lpips_weights(path)
    convs, lins = weights

    def features(img):
        # [0,1] -> [-1,1] -> lpips scaling
        x = (img * 2.0 - 1.0 - _LPIPS_SHIFT) / _LPIPS_SCALE
        x = jnp.moveaxis(x, -1, 0)[None]  # [1, C, H, W]
        taps = []
        stage = 0
        for (w, b), (cout, s) in zip(convs, _VGG16_PLAN):
            if s != stage:  # stage boundary: 2x2 max pool, tap previous
                taps.append(x)
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
                )
                stage = s
            x = jax.lax.conv_general_dilated(
                x, jnp.transpose(w, (3, 2, 0, 1)), (1, 1), "SAME"
            ) + b[None, :, None, None]
            x = jax.nn.relu(x)
        taps.append(x)
        return taps

    fp, ft = features(pred.astype(jnp.float32)), features(target.astype(jnp.float32))
    total = 0.0
    for a, b, lin in zip(fp, ft, lins):
        # unit-normalize along channels, squared diff, 1x1 linear head
        an = a / jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True) + 1e-10)
        bn = b / jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True) + 1e-10)
        d2 = (an - bn) ** 2  # [1, C, H, W]
        total = total + jnp.mean(jnp.sum(d2 * lin[None, :, None, None], axis=1))
    return total
