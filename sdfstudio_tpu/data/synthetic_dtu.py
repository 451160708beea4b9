"""DTU-like procedural benchmark scene with exact ground-truth geometry.

No DTU data ships in this environment (zero egress), so quality parity is
measured on a high-fidelity synthetic stand-in built to stress the same
properties as DTU scan65 (reference README.md:83 protocol): a compact
textured object with smooth blobby regions, a concavity, a handle
(genus>0), and fine surface detail, viewed from a DTU-style ring of 49
cameras at 384x384 with dark background. Ground truth is an analytic SDF,
so Chamfer-L1 is measured against the true surface rather than a scanned
proxy.

The object fits in ``|x| < 0.62``; evaluation crops predictions to
``r < crop_radius`` (default 0.75) — the synthetic analog of DTU's ObsMask
crop (background/table geometry is not scored there either).
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np


# ---------------------------------------------------------------------------
# Ground-truth SDF (works with numpy or jax.numpy via the xp argument)
# ---------------------------------------------------------------------------


def _smin(a, b, k, xp):
    """Polynomial smooth min (quadratic)."""
    h = xp.clip(0.5 + 0.5 * (b - a) / k, 0.0, 1.0)
    return b + (a - b) * h - k * h * (1.0 - h)


def _smax(a, b, k, xp):
    return -_smin(-a, -b, k, xp)


def gt_sdf(p, xp=np):
    """Analytic scene SDF at points p [..., 3]. Approximately metric
    (small displacement term; sphere-trace with step factor <=0.7)."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    r = xp.sqrt(xp.sum(p * p, axis=-1) + 1e-12)

    # main body: sphere
    d = r - 0.40

    # three blobs (smooth union)
    for c, rad in (
        ((0.28, 0.10, 0.18), 0.16),
        ((-0.22, 0.24, -0.10), 0.19),
        ((0.02, -0.30, 0.24), 0.14),
    ):
        dc = xp.sqrt(
            (x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2 + 1e-12
        ) - rad
        d = _smin(d, dc, 0.07, xp)

    # handle: torus around the +y pole (genus feature)
    ty = y - 0.38
    q = xp.sqrt(x * x + ty * ty + 1e-12) - 0.22
    dt = xp.sqrt(q * q + z * z + 1e-12) - 0.055
    d = _smin(d, dt, 0.05, xp)

    # concavity: smooth-subtract a sphere pushed into the -x face
    dc = xp.sqrt((x + 0.42) ** 2 + y * y + (z - 0.05) ** 2 + 1e-12) - 0.22
    d = _smax(d, -dc, 0.06, xp)

    # fine detail: low-amplitude trigonometric displacement
    disp = 0.012 * xp.sin(19.0 * x) * xp.sin(17.0 * y + 1.1) * xp.sin(21.0 * z + 2.3)
    return d + disp


def gt_normal(p, eps=5e-4):
    """Finite-difference normals of the GT SDF (numpy)."""
    offs = np.eye(3) * eps
    n = np.stack(
        [gt_sdf(p + offs[i]) - gt_sdf(p - offs[i]) for i in range(3)], axis=-1
    )
    return n / (np.linalg.norm(n, axis=-1, keepdims=True) + 1e-12)


def _albedo(p):
    """Procedural 3D texture: multi-frequency color bands + speckle."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    base = np.stack(
        [
            0.55 + 0.30 * np.sin(6.0 * x + 2.0 * np.sin(3.0 * y)),
            0.50 + 0.30 * np.sin(7.0 * y + 2.0 * np.sin(3.0 * z) + 1.7),
            0.45 + 0.30 * np.sin(8.0 * z + 2.0 * np.sin(3.0 * x) + 3.1),
        ],
        axis=-1,
    )
    speckle = 0.12 * np.sin(37.0 * x) * np.sin(41.0 * y) * np.sin(43.0 * z)
    stripes = 0.10 * np.sin(24.0 * (x + y + z))
    return np.clip(base + speckle[..., None] + stripes[..., None], 0.02, 1.0)


def _sphere_trace(origins, dirs, t0, t1, iters=96, step=0.7):
    """Vectorized sphere tracing of the GT SDF; returns (t, hit)."""
    t = np.full(origins.shape[:-1], t0, np.float32)
    for _ in range(iters):
        pts = origins + t[..., None] * dirs
        d = gt_sdf(pts).astype(np.float32)
        t = t + step * d
        t = np.minimum(t, t1)
    pts = origins + t[..., None] * dirs
    hit = (gt_sdf(pts) < 2.5e-3) & (t < t1 - 1e-3)
    return t, hit


def _shade(pts, normals, view_dirs):
    """Two directional lights + ambient + Blinn-Phong specular."""
    lights = np.array([[0.5, -0.4, 0.77], [-0.7, 0.3, 0.65]], np.float64)
    lights /= np.linalg.norm(lights, axis=-1, keepdims=True)
    light_rgb = np.array([[1.0, 0.96, 0.9], [0.35, 0.4, 0.5]])
    alb = _albedo(pts)
    col = 0.16 * alb
    for L, lc in zip(lights, light_rgb):
        lam = np.clip(np.einsum("...i,i->...", normals, L), 0, 1)
        col = col + alb * lam[..., None] * lc
        h = L - view_dirs
        h = h / (np.linalg.norm(h, axis=-1, keepdims=True) + 1e-9)
        spec = np.clip(np.einsum("...i,...i->...", normals, h), 0, 1) ** 48
        col = col + 0.25 * spec[..., None] * lc
    return np.clip(col, 0, 1)


def generate_dtu_like_dataset(
    out_dir: Path,
    num_images: int = 49,
    width: int = 384,
    height: int = 384,
    cam_radius: float = 2.2,
    with_fg_mask: bool = True,
    with_mono_prior: bool = False,
    val_every: int = 8,
    seed: int = 0,
) -> Path:
    """Render the scene to sdfstudio-data format (docs/sdfstudio-data.md).

    Masks are always written when with_fg_mask (the eval protocol uses
    them even if training does not).
    """
    from PIL import Image

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    fx = fy = 1.1 * width
    cx, cy = width / 2.0, height / 2.0
    intrinsics = np.array(
        [[fx, 0, cx, 0], [0, fy, cy, 0], [0, 0, 1, 0], [0, 0, 0, 1]], np.float64
    )

    rng = np.random.RandomState(seed)
    frames = []
    for i in range(num_images):
        # DTU-style rig: ring with varying elevation + slight radius jitter
        phi = 2 * np.pi * i / num_images
        elev = 0.30 + 0.28 * np.sin(2.0 * phi + 0.7) + 0.05 * rng.randn()
        rad = cam_radius * (1.0 + 0.03 * rng.randn())
        pos = rad * np.array(
            [np.cos(phi) * np.cos(elev), np.sin(phi) * np.cos(elev), np.sin(elev)]
        )
        forward = -pos / np.linalg.norm(pos)
        world_up = np.array([0.0, 0.0, 1.0])
        right = np.cross(forward, world_up)
        right /= np.linalg.norm(right)
        down = np.cross(forward, right)
        R = np.stack([right, down, forward], axis=1)
        c2w = np.eye(4)
        c2w[:3, :3] = R
        c2w[:3, 3] = pos

        ys, xs = np.meshgrid(
            np.arange(height) + 0.5, np.arange(width) + 0.5, indexing="ij"
        )
        d_cam = np.stack([(xs - cx) / fx, (ys - cy) / fy, np.ones_like(xs)], axis=-1)
        d_cam /= np.linalg.norm(d_cam, axis=-1, keepdims=True)
        d_world = (d_cam @ R.T).astype(np.float32)
        o_world = np.broadcast_to(pos.astype(np.float32), d_world.shape)

        t, hit = _sphere_trace(o_world, d_world, t0=rad - 0.75, t1=rad + 0.75)
        pts = o_world + t[..., None] * d_world
        normals = gt_normal(pts)

        rgb_fg = _shade(pts, normals, d_world)
        # dark DTU-style backdrop with a soft vignette
        rr = np.sqrt((xs / width - 0.5) ** 2 + (ys / height - 0.5) ** 2)
        bg = (0.055 + 0.03 * (1 - rr))[..., None] * np.array([1.0, 1.05, 1.1])
        img = np.where(hit[..., None], rgb_fg, np.clip(bg, 0, 1))

        name = f"{i:06d}_rgb.png"
        Image.fromarray((img * 255).astype(np.uint8)).save(out_dir / name)
        frame = {
            "rgb_path": name,
            "camtoworld": c2w.tolist(),
            "intrinsics": intrinsics.tolist(),
        }
        if with_fg_mask:
            mname = f"{i:06d}_foreground_mask.png"
            Image.fromarray((hit * 255).astype(np.uint8)).save(out_dir / mname)
            frame["foreground_mask"] = mname
        if with_mono_prior:
            z_depth = np.where(hit, t * d_cam[..., 2], 0.0).astype(np.float32)
            np.save(out_dir / f"{i:06d}_depth.npy", z_depth)
            n_cam = np.einsum("ij,hwj->hwi", R.T, normals)
            n_cam = np.where(hit[..., None], n_cam, np.array([0, 0, -1.0]))
            n01 = ((np.moveaxis(n_cam, -1, 0) + 1.0) / 2.0).astype(np.float32)
            np.save(out_dir / f"{i:06d}_normal.npy", n01)
            frame["mono_depth_path"] = f"{i:06d}_depth.npy"
            frame["mono_normal_path"] = f"{i:06d}_normal.npy"
        frames.append(frame)

    meta = {
        "camera_model": "OPENCV",
        "height": height,
        "width": width,
        "has_mono_prior": with_mono_prior,
        "has_sensor_depth": False,
        "has_foreground_mask": with_fg_mask,
        "has_sparse_sfm_points": False,
        "worldtogt": np.eye(4).tolist(),
        "scene_box": {
            "aabb": [[-1, -1, -1], [1, 1, 1]],
            "near": 0.8,
            "far": 4.0,
            "radius": 1.0,
            "collider_type": "near_far",
        },
        "frames": frames,
    }
    (out_dir / "meta_data.json").write_text(json.dumps(meta, indent=1))
    return out_dir


def gt_surface_samples(n: int = 200_000, resolution: int = 384, seed: int = 0):
    """Uniform-ish samples of the GT surface: sample the zero crossing by
    projecting near-surface grid points along the SDF gradient (2 Newton
    steps; |sdf| < 1e-4 after projection)."""
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-0.7, 0.7, size=(n * 4, 3)).astype(np.float64)
    d = gt_sdf(pts)
    keep = np.abs(d) < 0.08
    pts, d = pts[keep], d[keep]
    for _ in range(4):
        nrm = gt_normal(pts)
        pts = pts - d[..., None] * nrm
        d = gt_sdf(pts)
    ok = np.abs(d) < 5e-4
    pts = pts[ok]
    if len(pts) > n:
        pts = pts[rng.choice(len(pts), n, replace=False)]
    return pts


def chamfer_l1_to_gt(pred_verts: np.ndarray, crop_radius: float = 0.75) -> dict:
    """Chamfer-L1 between predicted mesh vertices and the GT surface.

    accuracy: pred->GT via |gt_sdf| at (cropped) predicted vertices
    (valid because gt_sdf is near-metric at the surface).
    completeness: GT surface samples -> nearest predicted vertex.
    Units match the scene's normalized box ([-1,1]; DTU reports mm of the
    world scale — here worldtogt is identity).
    """
    from scipy.spatial import cKDTree

    v = pred_verts[np.linalg.norm(pred_verts, axis=1) < crop_radius]
    if len(v) == 0:
        return {"accuracy": np.inf, "completeness": np.inf, "chamfer_l1": np.inf}
    accuracy = float(np.abs(gt_sdf(v)).mean())
    gt_pts = gt_surface_samples()
    d_min, _ = cKDTree(v).query(gt_pts, k=1)
    completeness = float(np.asarray(d_min).mean())
    return {
        "accuracy": accuracy,
        "completeness": completeness,
        "chamfer_l1": 0.5 * (accuracy + completeness),
        "n_pred_cropped": int(len(v)),
    }
