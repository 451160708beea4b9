"""Loss zoo.

Functional spec: reference nerfstudio/model_components/losses.py:38-770 —
mip-360 interlevel (outer/lossfun_outer), zip-NeRF interlevel (blur_stepfun),
distortion, ref-NeRF orientation/pred-normal, MonoSDF normal, MiDaS
scale-and-shift-invariant depth with multiscale gradient matching, NCC /
MultiViewLoss (Geo-NeuS), SensorDepthLoss (neural-RGBD), S3IM. All pure jnp;
weights arrays are [R, S] (no trailing channel).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdfstudio_tpu.core.math import searchsorted_right

EPS = 1.0e-7


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def eikonal_loss(gradients: jnp.ndarray) -> jnp.ndarray:
    """((|grad| - 1)^2).mean() over all sample gradients
    (reference base_surface_model.py:407-410)."""
    return jnp.mean((jnp.linalg.norm(gradients, axis=-1) - 1.0) ** 2)


# ---------------------------------------------------------------------------
# mip-NeRF-360 interlevel (proposal) loss — losses.py:38-112
# ---------------------------------------------------------------------------


def ray_samples_to_sdist(ray_samples) -> jnp.ndarray:
    """[R, S+1] bin edges in normalized s-space (losses.py:90-95)."""
    return jnp.concatenate(
        [ray_samples.spacing_starts, ray_samples.spacing_ends[..., -1:]], axis=-1
    )


def outer(t0_starts, t0_ends, t1_starts, t1_ends, y1):
    """Sum of y1 histogram mass within each (t0_start, t0_end) interval
    (losses.py:38-67)."""
    cy1 = jnp.concatenate(
        [jnp.zeros_like(y1[..., :1]), jnp.cumsum(y1, axis=-1)], axis=-1
    )
    idx_lo = searchsorted_right(t1_starts, t0_starts) - 1
    idx_lo = jnp.clip(idx_lo, 0, y1.shape[-1] - 1)
    idx_hi = searchsorted_right(t1_ends, t0_ends)
    idx_hi = jnp.clip(idx_hi, 0, y1.shape[-1] - 1)
    cy1_lo = jnp.take_along_axis(cy1[..., :-1], idx_lo, axis=-1)
    cy1_hi = jnp.take_along_axis(cy1[..., 1:], idx_hi, axis=-1)
    return cy1_hi - cy1_lo


def lossfun_outer(t, w, t_env, w_env):
    """Histogram-bound violation (losses.py:70-87)."""
    w_outer = outer(t[..., :-1], t[..., 1:], t_env[..., :-1], t_env[..., 1:], w_env)
    return jnp.clip(w - w_outer, 0.0, None) ** 2 / (w + EPS)


def interlevel_loss(weights_list: Sequence[jnp.ndarray], ray_samples_list) -> jnp.ndarray:
    """MipNeRF-360 proposal loss (losses.py:98-112)."""
    c = jax.lax.stop_gradient(ray_samples_to_sdist(ray_samples_list[-1]))
    w = jax.lax.stop_gradient(weights_list[-1])
    loss = 0.0
    for ray_samples, weights in zip(ray_samples_list[:-1], weights_list[:-1]):
        cp = ray_samples_to_sdist(ray_samples)
        loss = loss + jnp.mean(lossfun_outer(c, w, cp, weights))
    return loss


# ---------------------------------------------------------------------------
# zip-NeRF interlevel loss — losses.py:116-172
# ---------------------------------------------------------------------------


def blur_stepfun(x: jnp.ndarray, y: jnp.ndarray, r: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Convolve a step function with a box filter of radius r
    (losses.py:116-128). x: [R, N+1] edges, y: [R, N] values."""
    x_c = jnp.concatenate([x - r, x + r], axis=-1)
    x_idx = jnp.argsort(x_c, axis=-1)
    x_r = jnp.take_along_axis(x_c, x_idx, axis=-1)
    zeros = jnp.zeros_like(y[..., :1])
    y_1 = (
        jnp.concatenate([y, zeros], axis=-1) - jnp.concatenate([zeros, y], axis=-1)
    ) / (2 * r)
    y_2 = jnp.take_along_axis(
        jnp.concatenate([y_1, -y_1], axis=-1), x_idx[..., :-1], axis=-1
    )
    y_r = jnp.cumsum(
        (x_r[..., 1:] - x_r[..., :-1]) * jnp.cumsum(y_2, axis=-1), axis=-1
    )
    y_r = jnp.concatenate([zeros, y_r], axis=-1)
    return x_r, y_r


def interlevel_loss_zip(weights_list: Sequence[jnp.ndarray], ray_samples_list,
                        blur_radii: Sequence[float] = (0.03, 0.003)) -> jnp.ndarray:
    """Zip-NeRF anti-aliased proposal loss (losses.py:131-172)."""
    c = jax.lax.stop_gradient(ray_samples_to_sdist(ray_samples_list[-1]))
    w = jax.lax.stop_gradient(weights_list[-1])
    w_normalize = w / (c[..., 1:] - c[..., :-1])

    loss = 0.0
    for ray_samples, weights, r in zip(ray_samples_list[:-1], weights_list[:-1], blur_radii):
        x_r, y_r = blur_stepfun(c, w_normalize, r)
        y_r = jnp.clip(y_r, 0.0, None)
        # trapezoid accumulation
        y_cum = jnp.cumsum(
            (y_r[..., 1:] + y_r[..., :-1]) * 0.5 * (x_r[..., 1:] - x_r[..., :-1]),
            axis=-1,
        )
        y_cum = jnp.concatenate([jnp.zeros_like(y_cum[..., :1]), y_cum], axis=-1)

        cp = ray_samples_to_sdist(ray_samples)
        inds = searchsorted_right(x_r, cp)
        below = jnp.clip(inds - 1, 0, x_r.shape[-1] - 1)
        above = jnp.clip(inds, 0, x_r.shape[-1] - 1)
        x_g0 = jnp.take_along_axis(x_r, below, axis=-1)
        y_g0 = jnp.take_along_axis(y_cum, below, axis=-1)
        x_g1 = jnp.take_along_axis(x_r, above, axis=-1)
        y_g1 = jnp.take_along_axis(y_cum, above, axis=-1)
        t = jnp.clip(jnp.nan_to_num((cp - x_g0) / (x_g1 - x_g0), nan=0.0), 0.0, 1.0)
        bins = y_g0 + t * (y_g1 - y_g0)
        w_gt = bins[..., 1:] - bins[..., :-1]
        loss = loss + jnp.mean(jnp.clip(w_gt - weights, 0.0, None) ** 2 / (weights + 1e-5))
    return loss


# ---------------------------------------------------------------------------
# distortion loss — losses.py:176-195
# ---------------------------------------------------------------------------


def lossfun_distortion(t: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Per-ray mip-360 distortion (losses.py:176-187)."""
    ut = (t[..., 1:] + t[..., :-1]) / 2
    dut = jnp.abs(ut[..., :, None] - ut[..., None, :])
    loss_inter = jnp.sum(w * jnp.sum(w[..., None, :] * dut, axis=-1), axis=-1)
    loss_intra = jnp.sum(w**2 * (t[..., 1:] - t[..., :-1]), axis=-1) / 3
    return loss_inter + loss_intra


def distortion_loss(weights_list, ray_samples_list) -> jnp.ndarray:
    c = ray_samples_to_sdist(ray_samples_list[-1])
    w = weights_list[-1]
    return jnp.mean(lossfun_distortion(c, w))


# ---------------------------------------------------------------------------
# ref-NeRF losses — losses.py:240-261
# ---------------------------------------------------------------------------


def orientation_loss(weights: jnp.ndarray, normals: jnp.ndarray, viewdirs: jnp.ndarray):
    """Penalize normals facing away from the camera (losses.py:240-252)."""
    n_dot_v = jnp.sum(normals * viewdirs[..., None, :], axis=-1)
    return jnp.sum(weights * jnp.minimum(0.0, n_dot_v) ** 2, axis=-1)


def pred_normal_loss(weights: jnp.ndarray, normals: jnp.ndarray, pred_normals: jnp.ndarray):
    """Density-normal vs predicted-normal consistency (losses.py:255-261)."""
    return jnp.sum(weights * (1.0 - jnp.sum(normals * pred_normals, axis=-1)), axis=-1)


# ---------------------------------------------------------------------------
# MonoSDF monocular cues — losses.py:264-415
# ---------------------------------------------------------------------------


def monosdf_normal_loss(normal_pred: jnp.ndarray, normal_gt: jnp.ndarray) -> jnp.ndarray:
    """L1 + cosine consistency with monocular normals (losses.py:264-275)."""
    def normalize(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)

    normal_gt = normalize(normal_gt)
    normal_pred = normalize(normal_pred)
    l1 = jnp.mean(jnp.sum(jnp.abs(normal_pred - normal_gt), axis=-1))
    cos = jnp.mean(1.0 - jnp.sum(normal_pred * normal_gt, axis=-1))
    return l1 + cos


def compute_scale_and_shift(prediction, target, mask):
    """Closed-form 2x2 least-squares alignment (losses.py:279-299).
    Inputs [B, H, W]; returns (scale [B], shift [B])."""
    a_00 = jnp.sum(mask * prediction * prediction, axis=(1, 2))
    a_01 = jnp.sum(mask * prediction, axis=(1, 2))
    a_11 = jnp.sum(mask, axis=(1, 2))
    b_0 = jnp.sum(mask * prediction * target, axis=(1, 2))
    b_1 = jnp.sum(mask * target, axis=(1, 2))
    det = a_00 * a_11 - a_01 * a_01
    valid = det != 0
    safe_det = jnp.where(valid, det, 1.0)
    x_0 = jnp.where(valid, (a_11 * b_0 - a_01 * b_1) / safe_det, 0.0)
    x_1 = jnp.where(valid, (-a_01 * b_0 + a_00 * b_1) / safe_det, 0.0)
    return x_0, x_1


def _midas_mse(prediction, target, mask):
    M = jnp.sum(mask, axis=(1, 2))
    res = prediction - target
    image_loss = jnp.sum(mask * res * res, axis=(1, 2))
    divisor = jnp.sum(2 * M)
    return jnp.where(divisor == 0, 0.0, jnp.sum(image_loss) / jnp.maximum(divisor, 1.0))


def _gradient_loss(prediction, target, mask):
    M = jnp.sum(mask, axis=(1, 2))
    diff = mask * (prediction - target)
    grad_x = jnp.abs(diff[:, :, 1:] - diff[:, :, :-1]) * (mask[:, :, 1:] * mask[:, :, :-1])
    grad_y = jnp.abs(diff[:, 1:, :] - diff[:, :-1, :]) * (mask[:, 1:, :] * mask[:, :-1, :])
    image_loss = jnp.sum(grad_x, axis=(1, 2)) + jnp.sum(grad_y, axis=(1, 2))
    divisor = jnp.sum(M)
    return jnp.where(divisor == 0, 0.0, jnp.sum(image_loss) / jnp.maximum(divisor, 1.0))


def scale_and_shift_invariant_loss(
    prediction: jnp.ndarray,  # [B, H, W]
    target: jnp.ndarray,  # [B, H, W]
    mask: jnp.ndarray,  # [B, H, W]
    alpha: float = 0.5,
    scales: int = 4,
) -> jnp.ndarray:
    """MiDaS scale/shift-invariant depth loss with multiscale gradient
    matching (losses.py:392-410)."""
    scale, shift = compute_scale_and_shift(prediction, target, mask)
    pred_ssi = scale[:, None, None] * prediction + shift[:, None, None]
    total = _midas_mse(pred_ssi, target, mask)
    if alpha > 0:
        for s in range(scales):
            step = 2**s
            total = total + alpha * _gradient_loss(
                pred_ssi[:, ::step, ::step], target[:, ::step, ::step], mask[:, ::step, ::step]
            )
    return total


# ---------------------------------------------------------------------------
# Patch metrics: SSIM / NCC + Geo-NeuS multi-view loss — losses.py:422-624
# ---------------------------------------------------------------------------


def ncc_score(
    x: jnp.ndarray,  # [N, P, P, C] reference patches
    y: jnp.ndarray,  # [N, P, P, C] source patches
    min_patch_variance: float = 0.01,
) -> jnp.ndarray:
    """1 - normalized cross correlation of gray patches, in [0, 2]
    (losses.py:456-489). Returns [N]."""
    xg = jnp.mean(x, axis=-1)
    yg = jnp.mean(y, axis=-1)
    x_c = xg - jnp.mean(xg, axis=(1, 2), keepdims=True)
    y_c = yg - jnp.mean(yg, axis=(1, 2), keepdims=True)
    norm = jnp.sum(x_c * y_c, axis=(1, 2))
    x_var = jnp.sum(x_c**2, axis=(1, 2))
    y_var = jnp.sum(y_c**2, axis=(1, 2))
    denom = jnp.sqrt(x_var * y_var + 1e-6)
    ncc = norm / (denom + 1e-6)
    not_valid = (x_var < min_patch_variance) | (y_var < min_patch_variance)
    ncc = jnp.where(not_valid, 1.0, jnp.clip(ncc, -1.0, 1.0))
    return 1.0 - ncc


def multi_view_loss(
    patches: jnp.ndarray,  # [num_imgs, num_rays, P*P, C]; index 0 = reference
    valid: jnp.ndarray,  # [num_imgs, num_rays, P*P, 1] bool
    patch_size: int = 11,
    topk: int = 4,
    min_patch_variance: float = 0.01,
) -> jnp.ndarray:
    """Geo-NeuS top-k NCC over warped patches (losses.py:492-624)."""
    num_imgs, num_rays = patches.shape[0], patches.shape[1]
    C = patches.shape[-1]
    P = patch_size
    ref = jnp.broadcast_to(
        patches[:1].reshape(1, num_rays, P, P, C), (num_imgs - 1, num_rays, P, P, C)
    ).reshape(-1, P, P, C)
    src = patches[1:].reshape(-1, P, P, C)
    src_valid = valid[1:].reshape(-1, P * P)

    score = ncc_score(jax.lax.stop_gradient(ref), src, min_patch_variance)
    score = score.reshape(num_imgs - 1, num_rays)
    score_valid = jnp.all(src_valid, axis=-1).reshape(num_imgs - 1, num_rays)

    # topk smallest over source images (losses.py:555)
    k = min(topk, num_imgs - 1)
    neg_topk, idx = jax.lax.top_k(-score.T, k)  # [num_rays, k]
    min_score = -neg_topk
    min_valid = jnp.take_along_axis(score_valid.T, idx, axis=-1)
    min_score = jnp.where(min_valid, min_score, 0.0)
    return jnp.sum(min_score) / (jnp.sum(min_valid.astype(jnp.float32)) + 1e-6)


# ---------------------------------------------------------------------------
# Sensor depth loss — losses.py:628-676
# ---------------------------------------------------------------------------


def sensor_depth_loss(
    depth_pred: jnp.ndarray,  # [R, 1]
    depth_gt: jnp.ndarray,  # [R, 1]
    starts: jnp.ndarray,  # [R, S] euclidean sample starts
    pred_sdf: jnp.ndarray,  # [R, S]
    directions_norm: jnp.ndarray,  # [R, 1]
    truncation: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """L1 + free-space + truncated-SDF losses (losses.py:635-676)."""
    valid_gt = depth_gt > 0.0
    l1 = jnp.sum(valid_gt * jnp.abs(depth_gt - depth_pred)) / (jnp.sum(valid_gt) + 1e-6)

    z_vals = starts / directions_norm
    front = valid_gt & (z_vals < (depth_gt - truncation))
    back = valid_gt & (z_vals > (depth_gt + truncation))
    sdf_mask = valid_gt & (~front) & (~back)

    num_fs = jnp.sum(front)
    num_sdf = jnp.sum(sdf_mask)
    num = num_fs + num_sdf + 1e-6
    fs_weight = 1.0 - num_fs / num
    sdf_weight = 1.0 - num_sdf / num

    free_space = jnp.mean((jax.nn.relu(truncation - pred_sdf) * front) ** 2) * fs_weight
    sdf_l = jnp.mean(((z_vals + pred_sdf) - depth_gt) ** 2 * sdf_mask) * sdf_weight
    return l1, free_space, sdf_l


# ---------------------------------------------------------------------------
# S3IM — losses.py:689-770
# ---------------------------------------------------------------------------


def _gaussian_kernel(size: int, sigma: float) -> np.ndarray:
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2 * sigma**2))
    g = g / g.sum()
    k2 = np.outer(g, g).astype(np.float32)
    return k2


def _ssim_mean(img1: jnp.ndarray, img2: jnp.ndarray, kernel_size: int, stride: int) -> jnp.ndarray:
    """Mean SSIM with a gaussian window, grouped conv per channel
    (losses.py:711-731). img: [1, C, H, W]."""
    C = img1.shape[1]
    k = jnp.asarray(_gaussian_kernel(kernel_size, 1.5))[None, None]  # [1,1,K,K]
    kernel = jnp.tile(k, (C, 1, 1, 1))  # [C,1,K,K]
    pad = (kernel_size - 1) // 2

    def conv(x):
        return jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=C,
        )

    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = conv(img1 * img1) - mu1_sq
    sigma2_sq = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img1 * img2) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return jnp.mean(ssim_map)


def s3im_loss(
    src_vec: jnp.ndarray,  # [N, 3] rendered colors
    tar_vec: jnp.ndarray,  # [N, 3] gt colors
    rng: jax.Array,
    kernel_size: int = 4,
    stride: int = 4,
    repeat_time: int = 10,
    patch_height: int = 64,
) -> jnp.ndarray:
    """Stochastic structural similarity (losses.py:754-770): shuffle the ray
    batch into virtual patches repeat_time times and take 1 - SSIM."""
    n = tar_vec.shape[0]
    perms = [jnp.arange(n)]
    keys = jax.random.split(rng, repeat_time - 1)
    for i in range(repeat_time - 1):
        perms.append(jax.random.permutation(keys[i], n))
    idx = jnp.concatenate(perms)
    tar_all = tar_vec[idx]
    src_all = src_vec[idx]
    tar_patch = tar_all.T.reshape(1, 3, patch_height, -1)
    src_patch = src_all.T.reshape(1, 3, patch_height, -1)
    return 1.0 - _ssim_mean(src_patch, tar_patch, kernel_size, stride)


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------


def binary_cross_entropy(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """Foreground-mask BCE (base_surface_model.py:412-417 uses clip(eps, 1-eps))."""
    p = jnp.clip(pred, eps, 1.0 - eps)
    return -jnp.mean(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))


def curvature_loss(sampled_sdf: jnp.ndarray, sdf: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Neuralangelo discrete-laplacian curvature from the 6 numerical-grad
    taps (reference neus_facto.py:313-326): per-axis (a + c - 2b)/delta^2,
    mean of absolute values. sampled_sdf: [..., 6] ordered
    (+x, -x, +y, -y, +z, -z); sdf: [...]."""
    pairs = sampled_sdf.reshape(*sampled_sdf.shape[:-1], 3, 2)
    curvature = (jnp.sum(pairs, axis=-1) - 2.0 * sdf[..., None]) / (delta * delta + 1e-12)
    return jnp.mean(jnp.abs(curvature))
