"""Prepare Heritage-Recon scenes: foreground masks + voxelized sparse cloud.

Functional spec: reference scripts/heritage_to_nerfstudio.py — for each
registered COLMAP image of a Heritage-Recon scene it writes
``masks/<name>.npy``, the AND of
  (a) a semantic mask removing dynamic classes (person/car/bicycle/
      minibike, ADE ids 12/20/127/116; reference :263-270), and
  (b) a bounding-sphere visibility mask (pixels whose ray hits the
      scene's bounding sphere from config.yaml),
and exports the voxel-quantified sparse point cloud the NeuralReconW
coarse grid is built from (reference :117-195).

TPU-native redesign: the reference renders an icosphere with
pyrender/OpenGL just to get (b); a camera ray either hits the sphere or
it doesn't, so this does the closed-form ray-sphere test in numpy — no
GL, no trimesh, bit-exact at the silhouette.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from sdfstudio_tpu.data.utils import colmap_utils

# ADE20k ids of dynamic classes to mask out (reference :267)
SEMANTIC_IDS_TO_SKIP = (12, 20, 127, 116)


def sphere_visibility_mask(width, height, fx, fy, cx, cy, c2w,
                           origin, radius) -> np.ndarray:
    """[H, W] bool: does the pixel ray intersect the bounding sphere?

    Replaces the reference's pyrender depth pass (depth > 0 test) with
    the quadratic ray-sphere discriminant; also accepts cameras inside
    the sphere (t>=0 root).
    """
    u, v = np.meshgrid(np.arange(width) + 0.5, np.arange(height) + 0.5)
    dirs_cam = np.stack(
        [(u - cx) / fx, (v - cy) / fy, np.ones_like(u)], axis=-1)
    dirs = dirs_cam @ c2w[:3, :3].T
    o = c2w[:3, 3] - np.asarray(origin, dtype=np.float64)

    a = np.sum(dirs * dirs, axis=-1)
    b = 2.0 * dirs @ o
    c = float(o @ o) - radius * radius
    disc = b * b - 4.0 * a * c
    hit = disc >= 0.0
    sq = np.sqrt(np.maximum(disc, 0.0))
    # nearest non-negative root (camera may sit inside the sphere: c<0)
    t0 = (-b - sq) / (2.0 * a)
    t1 = (-b + sq) / (2.0 * a)
    return hit & (np.maximum(t0, t1) >= 0.0)


def voxelize_sparse_points(points: np.ndarray, origin, radius,
                           voxel_size: float, grid_size: int = 32):
    """Expand each sparse point into a voxel cube, quantify onto a
    [grid_size]^3 grid over [-radius, radius]^3, return occupied voxel
    centers (world frame). Reference :146-175."""
    pts = points - np.asarray(origin, dtype=np.float64)
    lin = np.linspace(-1.0, 1.0, 3) * voxel_size
    ox, oy, oz = np.meshgrid(lin, lin, lin, indexing="ij")
    offsets = np.stack([ox, oy, oz], axis=-1).reshape(-1, 3)
    expanded = (pts[:, None, :] + offsets[None]).reshape(-1, 3)

    inside = np.all((expanded > -radius) & (expanded < radius), axis=-1)
    expanded = expanded[inside]

    q = np.floor(((expanded / radius) + 1.0) * grid_size // 2).astype(np.int64)
    q = np.clip(q, 0, grid_size - 1)
    idx = q[:, 0] + q[:, 1] * grid_size + q[:, 2] * grid_size**2
    occ = np.zeros(grid_size**3, dtype=bool)
    occ[idx] = True

    vs = 2.0 * radius / grid_size
    centers_1d = np.linspace(-radius + vs / 2.0, radius - vs / 2.0, grid_size)
    ii = np.nonzero(occ)[0]
    flat = np.stack([centers_1d[ii % grid_size],
                     centers_1d[(ii // grid_size) % grid_size],
                     centers_1d[ii // grid_size**2]], axis=-1)
    return flat + np.asarray(origin, dtype=np.float64)


def save_points_ply(path: Path, points: np.ndarray) -> None:
    points = np.asarray(points, dtype=np.float32)
    with open(path, "wb") as f:
        f.write(
            b"ply\nformat binary_little_endian 1.0\n"
            + f"element vertex {len(points)}\n".encode()
            + b"property float x\nproperty float y\nproperty float z\n"
            + b"end_header\n")
        f.write(points.astype("<f4").tobytes())


def process_scene(scene_path: Path, sfm: str = "dense/sparse",
                  min_track_length: int | None = None) -> int:
    import yaml

    with open(scene_path / "config.yaml", "r", encoding="utf8") as f:
        cfg = yaml.safe_load(f)
    radius = float(cfg["radius"])
    origin = np.asarray(cfg["origin"], dtype=np.float64).reshape(3)
    voxel_size = float(cfg["voxel_size"])
    if min_track_length is None:
        min_track_length = int(cfg.get("min_track_length", 2))

    sparse = scene_path / sfm
    if (sparse / "cameras.bin").exists():
        cams = colmap_utils.read_cameras_binary(sparse / "cameras.bin")
        imgs = colmap_utils.read_images_binary(sparse / "images.bin")
        pts3d = colmap_utils.read_points3d_binary(sparse / "points3D.bin")
    else:
        cams = colmap_utils.read_cameras_text(sparse / "cameras.txt")
        imgs = colmap_utils.read_images_text(sparse / "images.txt")
        pts3d = colmap_utils.read_points3d_text(sparse / "points3D.txt")

    tracked = np.array([p.xyz for p in pts3d.values()
                        if p.point2D_idxs.shape[0] > min_track_length])
    if len(tracked):
        centers = voxelize_sparse_points(tracked, origin, radius, voxel_size)
        save_points_ply(scene_path / "sparse_voxels.ply", centers)
        print(f"sparse voxels: {len(centers)} (from {len(tracked)} tracked "
              f"points) -> sparse_voxels.ply")

    mask_dir = scene_path / "masks"
    mask_dir.mkdir(exist_ok=True)
    n = 0
    for img in imgs.values():
        cam = cams[img.camera_id]
        if cam.model != "PINHOLE":
            raise ValueError(f"only PINHOLE cameras supported, got {cam.model}")
        fx, fy, cx, cy = cam.params[:4]

        w2c = np.eye(4)
        w2c[:3, :3] = img.qvec2rotmat()
        w2c[:3, 3] = img.tvec
        c2w = np.linalg.inv(w2c)

        mask = sphere_visibility_mask(
            cam.width, cam.height, fx, fy, cx, cy, c2w, origin, radius)

        sem_path = (scene_path / "semantic_maps" /
                    img.name.rsplit(".", 1)[0]).with_suffix(".npz")
        if sem_path.exists():
            sem = np.load(sem_path)["arr_0"]
            keep = np.ones_like(sem, dtype=bool)
            for sid in SEMANTIC_IDS_TO_SKIP:
                keep &= sem != sid
            if keep.shape == mask.shape:
                mask &= keep

        np.save(mask_dir / (img.name.rsplit(".", 1)[0] + ".npy"), mask)
        n += 1
    print(f"wrote {n} masks -> {mask_dir}")
    return n


def entrypoint():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--scene-path", type=Path, required=True,
                    help="Heritage-Recon scene dir (config.yaml, dense/, "
                         "semantic_maps/)")
    ap.add_argument("--sfm", default="dense/sparse",
                    help="COLMAP sparse model subdir")
    ap.add_argument("--min-track-length", type=int, default=None)
    args = ap.parse_args()
    process_scene(args.scene_path, args.sfm, args.min_track_length)


if __name__ == "__main__":
    entrypoint()
