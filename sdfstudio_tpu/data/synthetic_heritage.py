"""Heritage-like procedural benchmark scene (unbounded + masks + appearance).

The DTU-like scene (synthetic_dtu.py) exercises the bounded object regime;
this scene exercises the OTHER training regime the framework supports — the
phototourism/heritage setup of reference
nerfstudio/data/dataparsers/heritage_dataparser.py:72-372 and the
NeuralReconW / bakedsdf method family:

* a monument (gate: plinths, pillars, lintel, crown — analytic SDF with a
  genus-1 opening) standing on an unbounded ground plane;
* a view-consistent distant environment (sky gradient + building skyline,
  a pure function of ray direction = geometry at infinity) that only a
  background model can explain;
* per-image appearance variation (exposure gain, white-balance tint,
  gamma) like real phototourism captures — the signal appearance
  embeddings exist to absorb;
* foreground masks (monument + near ground, like heritage's
  segmentation-derived masks);
* a sparse "SfM" point cloud written as a COLMAP TEXT model, so the real
  `heritage` dataparser path runs end-to-end: COLMAP read -> percentile
  normalization -> coarse occupancy grid -> NeuralReconW sampling.

Ground truth is the analytic SDF, so Chamfer-L1 is measured against the
true surface exactly as in the DTU-like protocol.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Tuple

import numpy as np

from sdfstudio_tpu.data.utils import colmap_utils


# ---------------------------------------------------------------------------
# Ground-truth geometry (world units ~ meters; monument ~7 m tall at origin)
# ---------------------------------------------------------------------------


def _length(v, xp):
    return xp.sqrt(xp.sum(v * v, axis=-1) + 1e-12)


def _rbox(p, center, half, r, xp):
    """Rounded-box SDF."""
    q = xp.abs(p - xp.asarray(center, dtype=p.dtype)) - xp.asarray(half, dtype=p.dtype)
    outside = _length(xp.maximum(q, 0.0), xp)
    inside = xp.minimum(xp.maximum(q[..., 0], xp.maximum(q[..., 1], q[..., 2])), 0.0)
    return outside + inside - r


def _smin(a, b, k, xp):
    h = xp.clip(0.5 + 0.5 * (b - a) / k, 0.0, 1.0)
    return b + (a - b) * h - k * h * (1.0 - h)


def _smax(a, b, k, xp):
    return -_smin(-a, -b, k, xp)


def monument_sdf(p, xp=np):
    """Gate-shaped monument (no ground): pillars + plinths + lintel + crown,
    with an arched opening (smooth-subtracted cylinder along y)."""
    d = None
    for sx in (-2.2, 2.2):
        pillar = _rbox(p, (sx, 0.0, 2.5), (0.62, 0.62, 2.5), 0.06, xp)
        plinth = _rbox(p, (sx, 0.0, 0.45), (0.95, 0.95, 0.45), 0.04, xp)
        leg = _smin(pillar, plinth, 0.08, xp)
        d = leg if d is None else _smin(d, leg, 0.05, xp)
    lintel = _rbox(p, (0.0, 0.0, 5.45), (3.35, 0.85, 0.55), 0.06, xp)
    crown = _rbox(p, (0.0, 0.0, 6.35), (1.1, 0.62, 0.42), 0.05, xp)
    d = _smin(d, _smin(lintel, crown, 0.07, xp), 0.06, xp)
    # arched opening through the lintel span (cylinder along y)
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    arch = xp.sqrt(x * x + (z - 4.4) ** 2 + 1e-12) - 1.35
    d = _smax(d, -arch, 0.08, xp)
    # masonry detail: low-amplitude displacement
    disp = 0.02 * xp.sin(7.1 * x) * xp.sin(6.3 * y + 0.9) * xp.sin(8.7 * z + 1.7)
    return d + disp


def gt_sdf(p, xp=np):
    """Full foreground SDF: monument smooth-unioned with the ground plane."""
    return _smin(monument_sdf(p, xp), p[..., 2], 0.04, xp)


def gt_normal(p, eps=1e-3):
    offs = np.eye(3) * eps
    n = np.stack(
        [gt_sdf(p + offs[i]) - gt_sdf(p - offs[i]) for i in range(3)], axis=-1
    )
    return n / (np.linalg.norm(n, axis=-1, keepdims=True) + 1e-12)


# ---------------------------------------------------------------------------
# Shading + environment
# ---------------------------------------------------------------------------


def _albedo(p):
    """Sandstone-ish monument, cobblestone-ish ground."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    stone = np.stack(
        [
            0.62 + 0.10 * np.sin(3.1 * z + 1.2 * np.sin(2.0 * x)),
            0.55 + 0.09 * np.sin(3.3 * z + 0.8),
            0.46 + 0.08 * np.sin(3.7 * z + 1.9),
        ],
        axis=-1,
    )
    speckle = 0.07 * np.sin(23.0 * x) * np.sin(27.0 * y + 0.4) * np.sin(25.0 * z)
    stone = stone + speckle[..., None]
    rings = 0.5 + 0.12 * np.sin(5.0 * np.sqrt(x * x + y * y)) + 0.06 * np.sin(
        11.0 * x
    ) * np.sin(13.0 * y)
    ground = np.stack([0.95 * rings, rings, 1.05 * rings], axis=-1) * 0.45
    on_ground = (z < 0.06)[..., None]
    return np.clip(np.where(on_ground, ground, stone), 0.02, 1.0)


def env_color(dirs):
    """View-consistent environment at infinity: sky gradient + sun + a
    building skyline that is a pure function of azimuth/elevation."""
    d = dirs / (np.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12)
    elev = d[..., 2]
    az = np.arctan2(d[..., 1], d[..., 0])
    t = np.clip(elev, 0.0, 1.0)
    sky = (1 - t[..., None]) * np.array([0.78, 0.86, 0.97]) + t[..., None] * np.array(
        [0.25, 0.45, 0.85]
    )
    sun_dir = np.array([0.45, -0.55, 0.70])
    sun_dir /= np.linalg.norm(sun_dir)
    sun = np.clip(np.einsum("...i,i->...", d, sun_dir), 0, 1) ** 220
    sky = sky + sun[..., None] * np.array([1.2, 1.1, 0.9])
    # skyline silhouette: buildings up to f(az) elevation
    height = (
        0.055
        + 0.045 * np.abs(np.sin(3.0 * az + 0.8))
        + 0.035 * np.abs(np.sin(7.0 * az + 2.2))
    )
    building = elev < height
    win = (np.sin(40.0 * az) > 0.55) & (np.sin(60.0 * elev + 1.0) > 0.3)
    bcol = np.where(win[..., None], 0.35, 0.16) * np.ones(3)
    col = np.where(building[..., None] & (elev[..., None] > -0.02), bcol, sky)
    return np.clip(col, 0, 1)


def _shade(pts, normals, view_dirs):
    sun = np.array([0.45, -0.55, 0.70])
    sun /= np.linalg.norm(sun)
    alb = _albedo(pts)
    lam = np.clip(np.einsum("...i,i->...", normals, sun), 0, 1)
    skyfill = 0.35 + 0.25 * np.clip(normals[..., 2], 0, 1)
    col = alb * (0.95 * lam[..., None] * np.array([1.0, 0.97, 0.9]) + 0.35 * skyfill[..., None] * np.array([0.7, 0.8, 1.0]))
    h = sun - view_dirs
    h = h / (np.linalg.norm(h, axis=-1, keepdims=True) + 1e-9)
    spec = np.clip(np.einsum("...i,...i->...", normals, h), 0, 1) ** 32
    col = col + 0.12 * spec[..., None]
    return np.clip(col, 0, 1)


def _sphere_trace(origins, dirs, t0, t1, iters=160, step=0.8):
    t = np.full(origins.shape[:-1], t0, np.float32)
    for _ in range(iters):
        pts = origins + t[..., None] * dirs
        d = gt_sdf(pts).astype(np.float32)
        t = t + step * d
        t = np.minimum(t, t1)
    pts = origins + t[..., None] * dirs
    hit = (gt_sdf(pts) < 8e-3) & (t < t1 - 1e-3)
    return t, hit


# ---------------------------------------------------------------------------
# The parser-identical normalization (heritage_dataparser percentile rule)
# ---------------------------------------------------------------------------


def normalization_from_points(
    xyz: np.ndarray, track_len: np.ndarray, min_track_length: int = 3,
    voxel_margin: float = 0.05,
) -> Tuple[np.ndarray, float]:
    """EXACTLY the transform data/dataparsers/colmap_family.py:180-187
    applies — keep in sync; tests assert the round trip."""
    xyz = xyz[track_len >= min_track_length]
    lo, hi = np.percentile(xyz, 2, axis=0), np.percentile(xyz, 98, axis=0)
    center = (lo + hi) / 2.0
    radius = float(np.max(hi - lo)) / 2.0 * (1 + voxel_margin)
    return center, radius


def load_normalization(scene_dir: Path) -> Tuple[np.ndarray, float]:
    """Recompute the heritage parser's world->normalized transform from the
    scene's committed COLMAP model (deterministic)."""
    pts = colmap_utils.read_points3d_text(
        Path(scene_dir) / "sparse" / "points3D.txt"
    )
    xyz = np.stack([p.xyz for p in pts.values()])
    track = np.asarray([len(p.image_ids) for p in pts.values()])
    return normalization_from_points(xyz, track)


# ---------------------------------------------------------------------------
# Dataset generation (COLMAP text model + images + masks)
# ---------------------------------------------------------------------------


def _sfm_points(rng: np.random.RandomState, n: int = 4000) -> np.ndarray:
    """Near-surface monument points, Newton-projected to the zero level."""
    pts = np.concatenate(
        [
            rng.uniform([-3.6, -1.2, 0.0], [3.6, 1.2, 7.2], size=(n * 6, 3)),
            # some ground points near the monument (SfM sees the plaza too)
            rng.uniform([-6, -6, -0.1], [6, 6, 0.15], size=(n * 2, 3)),
        ]
    )
    d = gt_sdf(pts)
    keep = np.abs(d) < 0.12
    pts, d = pts[keep], d[keep]
    for _ in range(4):
        nrm = gt_normal(pts)
        pts = pts - d[..., None] * nrm
        d = gt_sdf(pts)
    pts = pts[np.abs(d) < 2e-3]
    if len(pts) > n:
        pts = pts[rng.choice(len(pts), n, replace=False)]
    return pts


def generate_heritage_like_dataset(
    out_dir: Path,
    num_images: int = 36,
    width: int = 384,
    height: int = 384,
    num_points: int = 4000,
    seed: int = 0,
) -> Path:
    """Render the scene and write a heritage-parser-ready capture:
    images/ masks/ sparse/{cameras,images,points3D}.txt + gt_meta.json."""
    from PIL import Image

    out_dir = Path(out_dir)
    (out_dir / "images").mkdir(parents=True, exist_ok=True)
    (out_dir / "masks").mkdir(exist_ok=True)
    (out_dir / "sparse").mkdir(exist_ok=True)
    rng = np.random.RandomState(seed)

    pts3d = _sfm_points(rng, num_points)
    center, radius = normalization_from_points(
        pts3d, np.full(len(pts3d), 3)  # all tracks >= min length (set below)
    )

    target = np.array([0.0, 0.0, 2.8])
    cams: Dict[int, colmap_utils.ColmapCamera] = {}
    imgs: Dict[int, colmap_utils.ColmapImage] = {}
    appearance = []
    for i in range(num_images):
        # phototourism-style scatter: frontal arc, varying distance/height
        az = np.deg2rad(rng.uniform(-75, 75)) - np.pi / 2  # mostly y<0 side
        dist = rng.uniform(9.0, 16.0)
        zc = rng.uniform(1.2, 5.0)
        pos = np.array([dist * np.cos(az), dist * np.sin(az), zc])
        fwd = target - pos
        fwd /= np.linalg.norm(fwd)
        world_up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, world_up)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R_c2w = np.stack([right, down, fwd], axis=1)  # OpenCV columns

        f = rng.uniform(1.0, 1.35) * width
        cx, cy = width / 2.0, height / 2.0
        cams[i + 1] = colmap_utils.ColmapCamera(
            i + 1, "SIMPLE_PINHOLE", width, height, np.array([f, cx, cy])
        )
        R_w2c = R_c2w.T
        tvec = -R_w2c @ pos
        imgs[i + 1] = colmap_utils.ColmapImage(
            i + 1,
            colmap_utils.rotmat2qvec(R_w2c),
            tvec,
            i + 1,
            f"{i:06d}.png",
            np.zeros((0, 2)),
            np.zeros((0,), np.int64),
        )

        ys, xs = np.meshgrid(
            np.arange(height) + 0.5, np.arange(width) + 0.5, indexing="ij"
        )
        d_cam = np.stack([(xs - cx) / f, (ys - cy) / f, np.ones_like(xs)], axis=-1)
        d_cam /= np.linalg.norm(d_cam, axis=-1, keepdims=True)
        d_world = (d_cam @ R_c2w.T).astype(np.float32)
        o_world = np.broadcast_to(pos.astype(np.float32), d_world.shape)

        t, hit = _sphere_trace(o_world, d_world, t0=1.0, t1=60.0)
        pts = o_world + t[..., None] * d_world
        normals = gt_normal(pts)
        fg = _shade(pts, normals, d_world)
        img = np.where(hit[..., None], fg, env_color(d_world))

        # per-image appearance: exposure gain + white balance + gamma
        gain = rng.uniform(0.78, 1.28)
        tint = 1.0 + rng.uniform(-0.07, 0.07, size=3)
        gamma = rng.uniform(0.92, 1.10)
        appearance.append({"gain": gain, "tint": tint.tolist(), "gamma": gamma})
        img = np.clip(img * gain * tint, 0, 1) ** gamma

        Image.fromarray((img * 255).astype(np.uint8)).save(
            out_dir / "images" / f"{i:06d}.png"
        )
        # fg mask: geometry hits inside the normalized unit sphere
        norm_r = np.linalg.norm((pts - center) / radius, axis=-1)
        mask = hit & (norm_r < 0.95)
        Image.fromarray((mask * 255).astype(np.uint8)).save(
            out_dir / "masks" / f"{i:06d}.png"
        )

    points: Dict[int, colmap_utils.ColmapPoint3D] = {}
    alb = (np.clip(_albedo(pts3d), 0, 1) * 255).astype(int)
    for j, p in enumerate(pts3d):
        n_track = int(rng.randint(3, 9))
        ids = rng.choice(num_images, size=min(n_track, num_images), replace=False) + 1
        points[j + 1] = colmap_utils.ColmapPoint3D(
            j + 1, p, alb[j], float(rng.uniform(0.2, 1.0)),
            ids.astype(np.int64), np.zeros(len(ids), np.int64),
        )

    colmap_utils.write_cameras_text(cams, out_dir / "sparse" / "cameras.txt")
    colmap_utils.write_images_text(imgs, out_dir / "sparse" / "images.txt")
    colmap_utils.write_points3d_text(points, out_dir / "sparse" / "points3D.txt")
    (out_dir / "gt_meta.json").write_text(
        json.dumps(
            {
                "center": center.tolist(),
                "radius": radius,
                "appearance": appearance,
                "num_images": num_images,
            },
            indent=1,
        )
    )
    return out_dir


# ---------------------------------------------------------------------------
# Geometry evaluation (normalized space, monument crop)
# ---------------------------------------------------------------------------


def gt_surface_samples(n: int = 150_000, seed: int = 1) -> np.ndarray:
    """World-space samples of the monument + near-ground surface."""
    rng = np.random.RandomState(seed)
    return _sfm_points(rng, n)


def chamfer_l1_to_gt(
    pred_verts_normalized: np.ndarray, scene_dir: Path, crop_radius: float = 0.9
) -> dict:
    """Chamfer-L1 for a mesh extracted in the parser's NORMALIZED frame.

    Vertices are mapped back to world via the deterministic normalization
    recomputed from the committed sparse model; accuracy uses |gt_sdf|
    (near-metric), completeness uses GT surface samples -> nearest vertex.
    Values are reported in NORMALIZED units (radius=1 sphere) to match the
    DTU-like protocol's scale convention."""
    from scipy.spatial import cKDTree

    center, radius = load_normalization(scene_dir)
    v_n = pred_verts_normalized
    v_n = v_n[np.linalg.norm(v_n, axis=1) < crop_radius]
    if len(v_n) == 0:
        return {"accuracy": np.inf, "completeness": np.inf, "chamfer_l1": np.inf}
    v_w = v_n * radius + center
    accuracy = float(np.abs(gt_sdf(v_w)).mean() / radius)
    gt_w = gt_surface_samples()
    gt_n = (gt_w - center) / radius
    gt_n = gt_n[np.linalg.norm(gt_n, axis=1) < crop_radius]
    d_min, _ = cKDTree(v_n).query(gt_n, k=1)
    completeness = float(np.asarray(d_min).mean())
    return {
        "accuracy": accuracy,
        "completeness": completeness,
        "chamfer_l1": 0.5 * (accuracy + completeness),
        "n_pred_cropped": int(len(v_n)),
    }
