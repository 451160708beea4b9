"""Geo-NeuS patch warping via per-point homographies.

Functional spec: reference nerfstudio/model_components/patch_warping.py:27-242.
TPU adaptation: no masked compaction — all rays keep static shapes and a
validity mask travels with the patches (invalid rays produce zero patches).
The torch grid_sample is replaced by an explicit bilinear gather.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdfstudio_tpu.cameras.cameras import Cameras
from sdfstudio_tpu.core.rays import RaySamples


def get_intersection_points(
    ray_samples: RaySamples,
    sdf: jnp.ndarray,  # [R, S]
    normal: jnp.ndarray,  # [R, S, 3]
    in_image_mask: jnp.ndarray,  # [R] bool
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """First +->- crossing point + interpolated normal
    (reference patch_warping.py:27-90). Returns (points [R,3],
    normals [R,3], mask [R])."""
    n_samples = sdf.shape[-1]
    starts = ray_samples.starts
    sign_matrix = jnp.concatenate(
        [jnp.sign(sdf[:, :-1] * sdf[:, 1:]), jnp.ones_like(sdf[:, :1])], axis=-1
    )
    cost_matrix = sign_matrix * jnp.arange(n_samples, 0, -1, dtype=sdf.dtype)
    values = jnp.min(cost_matrix, axis=-1)
    indices = jnp.argmin(cost_matrix, axis=-1)
    mask = (values < 0) & (jnp.take_along_axis(sdf, indices[:, None], -1)[:, 0] > 0) & in_image_mask

    idx_hi = jnp.clip(indices + 1, None, n_samples - 1)
    take = lambda arr, idx: jnp.take_along_axis(arr, idx[:, None], axis=-1)[:, 0]
    d_low, v_low = take(starts, indices), take(sdf, indices)
    d_high, v_high = take(starts, idx_hi), take(sdf, idx_hi)
    n_low = jnp.take_along_axis(normal, indices[:, None, None].repeat(3, -1), axis=1)[:, 0]
    n_high = jnp.take_along_axis(normal, idx_hi[:, None, None].repeat(3, -1), axis=1)[:, 0]

    denom = jnp.where(jnp.abs(v_low - v_high) > 1e-12, v_low - v_high, 1e-12)
    z = (v_low * d_high - v_high * d_low) / denom
    z = jnp.clip(z, starts[:, 0], starts[:, -1])
    points = ray_samples.origins + ray_samples.directions * z[:, None]

    pn = (v_low[:, None] * n_high - v_high[:, None] * n_low) / denom[:, None]
    pn = pn / jnp.sqrt(jnp.sum(pn**2, axis=-1, keepdims=True) + 1e-12)

    valid_normal = jnp.abs(jnp.sum(pn * ray_samples.directions, axis=-1)) > 0.1
    return points, pn, mask & valid_normal


def get_homography(
    points: jnp.ndarray,  # [P, 3]
    normal: jnp.ndarray,  # [P, 3]
    cameras: Cameras,
    valid_angle_thres: float = 0.3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-point homographies H = K (R_rel + t_rel n^T / d) K^-1 in OpenCV
    convention; camera 0 is the reference view
    (reference patch_warping.py:93-137). Returns (H [N, P, 3, 3],
    valid [N, P])."""
    c2w = jnp.concatenate(
        [cameras.camera_to_worlds[:, :3, :1],
         -cameras.camera_to_worlds[:, :3, 1:3],
         cameras.camera_to_worlds[:, :3, 3:]],
        axis=-1,
    )  # nerfstudio -> opencv
    K = cameras.get_intrinsics_matrices()
    K_inv = jnp.linalg.inv(K)

    w2c_r = jnp.swapaxes(c2w[:, :3, :3], 1, 2)
    w2c_t = -w2c_r @ c2w[:, :3, 3:]

    R_rel = w2c_r @ c2w[:1, :3, :3]  # [N, 3, 3]
    t_rel = w2c_r @ c2w[:1, :3, 3:] + w2c_t[:1]  # [N, 3, 1]

    p_ref = w2c_r[0] @ points.T + w2c_t[0]  # [3, P]
    n_ref = w2c_r[0] @ normal.T  # [3, P]
    d = jnp.sum(n_ref * p_ref, axis=0, keepdims=True)  # [1, P]

    H = R_rel[:, None] + t_rel[:, None] @ n_ref.T[None, :, None, :] / d.T[None, :, :, None]
    H = K[:, None] @ H @ K_inv[None, :1]  # [N, P, 3, 3]

    dir_src = c2w[:, None, :, 3] - points[None]
    dir_src = dir_src / jnp.sqrt(jnp.sum(dir_src**2, axis=-1, keepdims=True) + 1e-12)
    valid = jnp.sum(dir_src * normal[None], axis=-1) > valid_angle_thres
    p_src = w2c_r @ points.T + w2c_t  # [N, 3, P]
    valid = valid & (p_src[:, 2, :] > 0.01)
    return H, valid


def bilinear_sample(images: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """grid_sample(align_corners=True, zeros padding) equivalent.

    images: [N, H, W, C]; coords: [N, ..., 2] in [-1, 1] (x, y)."""
    N, H, W, C = images.shape
    x = (coords[..., 0] + 1) * 0.5 * (W - 1)
    y = (coords[..., 1] + 1) * 0.5 * (H - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(xi, yi):
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        vals = jax.vmap(lambda img, yy, xx: img[yy, xx])(images, yi_c, xi_c)
        return vals * inb[..., None]

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    top = v00 * (1 - wx[..., None]) + v01 * wx[..., None]
    bot = v10 * (1 - wx[..., None]) + v11 * wx[..., None]
    return top * (1 - wy[..., None]) + bot * wy[..., None]


def patch_warping(
    ray_samples: RaySamples,
    sdf: jnp.ndarray,  # [R, S]
    normal: jnp.ndarray,  # [R, S, 3]
    cameras: Cameras,  # reference camera first, then sources
    images: jnp.ndarray,  # [N, H, W, 3]
    pix_indices: jnp.ndarray,  # [R, 2] (y, x) of each ray in the ref image
    patch_size: int = 31,
    pixel_offset: float = 0.5,
    valid_angle_thres: float = 0.3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Warp ref-image patches into all views through the tangent-plane
    homography (reference PatchWarping.forward, patch_warping.py:158-242).

    Returns (patches [N, R, patch^2, 3], valid [N, R, patch^2, 1])."""
    half = patch_size // 2
    H_img = cameras.height[0]
    W_img = cameras.width[0]
    in_image = (
        (pix_indices[:, 0] > half)
        & (pix_indices[:, 1] > half)
        & (pix_indices[:, 0] < H_img - half - 1)
        & (pix_indices[:, 1] < W_img - half - 1)
    )

    points, pnormal, mask = get_intersection_points(ray_samples, sdf, normal, in_image)
    Hmat, H_valid = get_homography(points, pnormal, cameras, valid_angle_thres)

    # (y, x) -> homogeneous (x, y, 1) patch grids
    yy, xx = jnp.meshgrid(
        jnp.arange(-half, half + 1), jnp.arange(-half, half + 1), indexing="ij"
    )
    patch = jnp.stack([xx, yy], axis=-1).reshape(-1, 2).astype(jnp.float32)  # [p^2, 2]
    base = jnp.flip(pix_indices, axis=-1).astype(jnp.float32) + pixel_offset  # (x, y)
    coords = base[:, None, :] + patch[None]  # [R, p^2, 2]
    ones = jnp.ones_like(coords[..., :1])
    hom = jnp.concatenate([coords, ones], axis=-1)  # [R, p^2, 3]

    warped = jnp.einsum("nrij,rpj->nrpi", Hmat, hom)  # [N, R, p^2, 3]
    positive_depth = warped[..., 2] >= 0.2
    denom = warped[..., 2:] * positive_depth[..., None] + 1e-6
    uv = warped[..., :2] / denom  # pixel (x, y)

    gx = uv[..., 0] / (W_img - 1) * 2 - 1
    gy = uv[..., 1] / (H_img - 1) * 2 - 1
    grid = jnp.stack([gx, gy], axis=-1)
    in_bounds = (gx > -1) & (gx < 1) & (gy > -1) & (gy < 1)
    valid = in_bounds & H_valid[..., None] & positive_depth & mask[None, :, None]

    rgb = bilinear_sample(images, grid)  # [N, R, p^2, 3]
    rgb = rgb * valid[..., None]
    return rgb, valid[..., None]
