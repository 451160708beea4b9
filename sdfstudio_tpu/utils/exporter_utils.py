"""Export helpers: point clouds from rendered depth + TSDF fusion.

Functional spec: reference nerfstudio/exporter/exporter_utils.py:86-208
(generate_point_cloud / render_trajectory) and exporter/tsdf_utils.py
(voxel TSDF integration from rendered depth, MC mesh). The TSDF
integration runs as vectorized jnp over the voxel grid; topology via our
marching tetrahedra.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdfstudio_tpu.utils.marching_cubes import marching_tetrahedra
from sdfstudio_tpu.utils.mesh_io import TriMesh


def generate_point_cloud(
    trainer,
    num_points: int = 1000000,
    remove_outliers: bool = True,
    use_train_cameras: bool = True,
    min_accumulation: float = 0.5,
    std_ratio: float = 10.0,
) -> TriMesh:
    """Backproject rendered depth into a colored point cloud
    (reference exporter_utils.py:86-142)."""
    dm = trainer.datamanager
    cams = dm.train_cameras if use_train_cameras else dm.eval_cameras
    points, colors, normals = [], [], []
    n_cams = cams.num_cameras
    for i in range(n_cams):
        out = trainer.render_image(trainer.state.params, i, eval_cameras=not use_train_cameras)
        bundle = cams.generate_image_rays(i)
        h, w = out["rgb"].shape[:2]
        origins = np.asarray(bundle.origins).reshape(h, w, 3)
        dirs = np.asarray(bundle.directions).reshape(h, w, 3)
        dnorm = np.asarray(bundle.directions_norm).reshape(h, w, 1)
        depth = out["depth"] * dnorm  # back to point-to-point distance
        pts = origins + dirs * depth
        acc = out["accumulation"][..., 0]
        m = acc > min_accumulation
        points.append(pts[m])
        colors.append(out["rgb"][m])
        if "normal" in out:
            normals.append(out["normal"][m])
    points = np.concatenate(points)
    colors = np.concatenate(colors)
    normals = np.concatenate(normals) if normals else None

    if len(points) > num_points:
        sel = np.random.RandomState(0).choice(len(points), num_points, replace=False)
        points, colors = points[sel], colors[sel]
        normals = normals[sel] if normals is not None else None

    if remove_outliers and len(points) > 100:
        center = points.mean(axis=0)
        d = np.linalg.norm(points - center, axis=-1)
        keep = d < d.mean() + std_ratio * d.std()
        points, colors = points[keep], colors[keep]
        normals = normals[keep] if normals is not None else None

    return TriMesh(
        vertices=points,
        faces=np.zeros((0, 3), np.int64),
        colors=colors,
        normals=normals,
    )


def tsdf_fusion(
    trainer,
    resolution: int = 128,
    bounds_min: Tuple[float, float, float] = (-1, -1, -1),
    bounds_max: Tuple[float, float, float] = (1, 1, 1),
    truncation_ratio: float = 4.0,
    use_train_cameras: bool = True,
) -> TriMesh:
    """Volumetric TSDF integration of rendered depth maps
    (reference exporter/tsdf_utils.py:168-272), then surface extraction."""
    dm = trainer.datamanager
    cams = dm.train_cameras if use_train_cameras else dm.eval_cameras
    bmin = np.asarray(bounds_min, np.float32)
    bmax = np.asarray(bounds_max, np.float32)
    voxel_size = float((bmax - bmin).max() / resolution)
    truncation = truncation_ratio * voxel_size

    xs = np.linspace(bmin[0], bmax[0], resolution, dtype=np.float32)
    ys = np.linspace(bmin[1], bmax[1], resolution, dtype=np.float32)
    zs = np.linspace(bmin[2], bmax[2], resolution, dtype=np.float32)
    grid = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), axis=-1).reshape(-1, 3)
    grid_j = jnp.asarray(grid)

    tsdf = jnp.ones((grid.shape[0],), jnp.float32)
    weights = jnp.zeros((grid.shape[0],), jnp.float32)

    K = np.asarray(cams.get_intrinsics_matrices())
    c2ws = np.asarray(cams.camera_to_worlds)

    @jax.jit
    def integrate(tsdf, weights, w2c_R, w2c_t, Ki, depth_img):
        # voxel -> camera (nerfstudio convention: -z forward)
        pc = (w2c_R @ grid_j.T + w2c_t).T  # [V, 3]
        z = -pc[..., 2]
        x = pc[..., 0] / jnp.where(z > 1e-6, z, 1e-6)
        y = -pc[..., 1] / jnp.where(z > 1e-6, z, 1e-6)
        u = Ki[0, 0] * x + Ki[0, 2]
        v = Ki[1, 1] * y + Ki[1, 2]
        H, W = depth_img.shape
        inb = (z > 1e-6) & (u >= 0) & (u < W - 1) & (v >= 0) & (v < H - 1)
        ui = jnp.clip(u.astype(jnp.int32), 0, W - 1)
        vi = jnp.clip(v.astype(jnp.int32), 0, H - 1)
        d = depth_img[vi, ui]
        sdf_val = (d - z) / truncation
        valid = inb & (d > 0) & (sdf_val > -1.0)
        sdf_val = jnp.clip(sdf_val, -1.0, 1.0)
        w_new = weights + valid
        tsdf_new = jnp.where(
            valid, (tsdf * weights + sdf_val) / jnp.maximum(w_new, 1.0), tsdf
        )
        return tsdf_new, w_new

    for i in range(cams.num_cameras):
        out = trainer.render_image(trainer.state.params, i, eval_cameras=not use_train_cameras)
        # z-depth: rendered depth is distance/directions_norm = z-depth already
        depth_img = jnp.asarray(out["depth"][..., 0])
        c2w = c2ws[i]
        R_ = c2w[:3, :3].T
        t_ = -R_ @ c2w[:3, 3:]
        tsdf, weights = integrate(tsdf, weights, jnp.asarray(R_), jnp.asarray(t_), jnp.asarray(K[i]), depth_img)

    vol = np.asarray(tsdf).reshape(resolution, resolution, resolution)
    wvol = np.asarray(weights).reshape(resolution, resolution, resolution)
    vol = np.where(wvol > 0, vol, 1.0)
    spacing = (bmax - bmin) / (resolution - 1)
    return marching_tetrahedra(vol, 0.0, origin=bmin, spacing=spacing)
