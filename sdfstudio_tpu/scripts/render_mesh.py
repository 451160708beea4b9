"""sst-render-mesh: render a mesh-trajectory video.

Functional spec: reference scripts/render_mesh.py:71-253 (open3d offscreen
mesh rendering along a camera path). open3d is unavailable here, so
rendering uses a vectorized numpy surfel splatter: each triangle is sampled
proportionally to its area, points are projected with a z-buffer, and shaded
with Lambertian + headlight from face normals. Adequate for preview videos;
export the mesh for DCC-quality renders.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def sample_surfels(mesh, samples_per_area: float = 2e5, max_points: int = 4_000_000):
    tri = mesh.vertices[mesh.faces]  # [F, 3, 3]
    v0, v1, v2 = tri[:, 0], tri[:, 1], tri[:, 2]
    cross = np.cross(v1 - v0, v2 - v0)
    area = 0.5 * np.linalg.norm(cross, axis=-1)
    normals = cross / np.maximum(np.linalg.norm(cross, axis=-1, keepdims=True), 1e-12)
    counts = np.maximum((area * samples_per_area).astype(int), 1)
    total = counts.sum()
    if total > max_points:
        counts = np.maximum((counts * (max_points / total)).astype(int), 1)
        total = counts.sum()
    face_idx = np.repeat(np.arange(len(tri)), counts)
    rng = np.random.RandomState(0)
    r1 = np.sqrt(rng.uniform(size=total))
    r2 = rng.uniform(size=total)
    a = 1 - r1
    b = r1 * (1 - r2)
    c = r1 * r2
    pts = (
        a[:, None] * v0[face_idx] + b[:, None] * v1[face_idx] + c[:, None] * v2[face_idx]
    )
    nrm = normals[face_idx]
    col = mesh.colors[mesh.faces[face_idx, 0]] if mesh.colors is not None else None
    return pts.astype(np.float32), nrm.astype(np.float32), col


def splat_render(pts, normals, colors, c2w, fx, fy, cx, cy, H, W, splat: int = 1):
    """Project + z-buffer splat. c2w is nerfstudio convention (-z forward)."""
    R = c2w[:3, :3]
    t = c2w[:3, 3]
    pc = (pts - t) @ R  # world -> camera
    z = -pc[:, 2]
    valid = z > 1e-4
    u = (pc[:, 0] / z * fx + cx).astype(np.int32)
    v = (-pc[:, 1] / z * fy + cy).astype(np.int32)
    valid &= (u >= 0) & (u < W) & (v >= 0) & (v < H)
    u, v, z = u[valid], v[valid], z[valid]
    n = normals[valid]
    # headlight shading
    view = np.array([0, 0, 1.0]) @ R.T
    lam = np.abs(n @ (R @ np.array([0, 0, 1.0])))
    base = colors[valid] if colors is not None else np.full((len(z), 3), 0.8)
    shade = np.clip(base * (0.25 + 0.75 * lam[:, None]), 0, 1)

    depth = np.full((H, W), np.inf, np.float32)
    flat = v * W + u
    np.minimum.at(depth.reshape(-1), flat, z)
    keep = z <= depth.reshape(-1)[flat] * (1 + 1e-4)
    img = np.ones((H * W, 3), np.float32)
    img[flat[keep]] = shade[keep]
    return img.reshape(H, W, 3)


def main(input_mesh: Path, output_path: Path, num_frames: int = 60, fps: int = 24,
         resolution: int = 512, radius_mult: float = 2.2):
    from sdfstudio_tpu.cameras.camera_utils import viewmatrix
    from sdfstudio_tpu.utils.mesh_io import read_ply

    mesh = read_ply(input_mesh)
    pts, normals, colors = sample_surfels(mesh)
    center = mesh.vertices.mean(axis=0)
    radius = np.linalg.norm(mesh.vertices - center, axis=-1).max() * radius_mult
    H = W = resolution
    focal = 1.1 * resolution

    frames = []
    for i in range(num_frames):
        phi = 2 * np.pi * i / num_frames
        pos = center + radius * np.array(
            [np.cos(phi), np.sin(phi), 0.45]
        ) / np.linalg.norm([1, 0, 0.45])
        pose = viewmatrix(-(center - pos), np.array([0, 0, 1.0]), pos)
        img = splat_render(pts, normals, colors, pose, focal, focal, W / 2, H / 2, H, W)
        frames.append((np.clip(img, 0, 1) * 255).astype(np.uint8))
        print(f"frame {i + 1}/{num_frames}", flush=True)

    import imageio.v2 as imageio

    output_path.parent.mkdir(parents=True, exist_ok=True)
    imageio.mimwrite(output_path, np.stack(frames), fps=fps)
    print(f"wrote {output_path}")


def entrypoint():
    from sdfstudio_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # honor SST_JAX_PLATFORM (sitecustomize pins axon)

    p = argparse.ArgumentParser()
    p.add_argument("--input-mesh", type=Path, required=True)
    p.add_argument("--output-path", type=Path, default=Path("renders/mesh.mp4"))
    p.add_argument("--num-frames", type=int, default=60)
    p.add_argument("--fps", type=int, default=24)
    p.add_argument("--resolution", type=int, default=512)
    a = p.parse_args()
    main(a.input_mesh, a.output_path, a.num_frames, a.fps, a.resolution)


if __name__ == "__main__":
    entrypoint()
