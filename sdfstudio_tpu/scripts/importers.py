"""Capture-app importers: polycam / metashape / record3d -> transforms.json.

Functional spec: reference nerfstudio/process_data/{polycam_utils.py:30-92,
metashape_utils.py:37-131, record3d_utils.py:31-94} and the subcommand
wiring in reference scripts/process_data.py:733. Each importer reads the
vendor's native export and writes a nerfstudio-convention
``transforms.json`` (camera-to-world, OpenGL-style axes) next to an
``images/`` directory, ready for `sst-train ... nerfstudio-data` or the
sdfstudio converters in scripts/datasets/.

Conventions (shared helper below):

* All three vendors hand out camera-to-world matrices whose WORLD frame
  differs from nerfstudio's. The reference permutes world rows with the
  cycle (x,y,z) -> (z,x,y) so gravity lands on +z (polycam_utils.py:71-76,
  metashape_utils.py:107-114); record3d poses are used unpermuted because
  ARKit's world is already gravity-aligned with the axes record3d exports
  (record3d_utils.py:49-57).
* Metashape additionally stores OpenCV-style camera axes (+z forward), so
  its rotation columns 1,2 are negated on import (metashape_utils.py:109).
"""
from __future__ import annotations

import json
import shutil
import xml.etree.ElementTree as ET
from pathlib import Path

import numpy as np

# world-axis cycle (x,y,z)->(z,x,y): row permutation applied to c2w
WORLD_CYCLE = np.array([2, 0, 1], dtype=np.int64)


def _cycle_world(c2w: np.ndarray) -> np.ndarray:
    """Permute the world axes of a 4x4 camera-to-world matrix."""
    out = np.eye(4, dtype=np.float64)
    out[:3] = c2w[WORLD_CYCLE, :]
    return out


def _write_transforms(out_dir: Path, meta: dict) -> Path:
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / "transforms.json"
    path.write_text(json.dumps(meta, indent=2))
    print(f"wrote {path} with {len(meta['frames'])} frames", flush=True)
    return path


def _stage_image(src: Path, images_dir: Path, name: str) -> str:
    images_dir.mkdir(parents=True, exist_ok=True)
    dst = images_dir / name
    if src.resolve() != dst.resolve():
        shutil.copy(src, dst)
    return f"images/{name}"


# ---------------------------------------------------------------------------
# Polycam
# ---------------------------------------------------------------------------


def polycam_to_transforms(
    data_dir: Path,
    output_dir: Path,
    min_blur_score: float = 25.0,
    crop_border_pixels: int = 15,
    use_uncorrected_images: bool = False,
) -> dict:
    """Import a Polycam export (the unzipped ``keyframes/`` tree).

    Layout: ``keyframes/corrected_cameras/<stem>.json`` +
    ``keyframes/corrected_images/<stem>.jpg`` (or the uncorrected pair).
    Each camera JSON carries fx/fy/cx/cy/width/height, a row-major 3x4
    camera-to-world in ``t_00..t_23``, and optionally ``blur_score``.
    Per-frame intrinsics are preserved (polycam exports vary per frame).
    Reference: polycam_utils.py:30-92.
    """
    data_dir = Path(data_dir)
    keyframes = data_dir / "keyframes" if (data_dir / "keyframes").exists() else data_dir
    flavor = "" if use_uncorrected_images else "corrected_"
    cameras_dir = keyframes / f"{flavor}cameras"
    images_dir = keyframes / f"{flavor}images"
    if not cameras_dir.exists():  # fall back to the other flavor
        flavor = "corrected_" if use_uncorrected_images else ""
        cameras_dir = keyframes / f"{flavor}cameras"
        images_dir = keyframes / f"{flavor}images"
    if not cameras_dir.exists():
        raise FileNotFoundError(f"no polycam cameras dir under {keyframes}")
    # uncorrected images keep their distortion: cropping borders assumes the
    # corrected (undistorted) flavor, like the reference (process_data.py)
    crop = 0 if flavor == "" else crop_border_pixels

    frames, skipped = [], 0
    out_images = Path(output_dir) / "images"
    for i, cam_json in enumerate(sorted(cameras_dir.glob("*.json"))):
        info = json.loads(cam_json.read_text())
        if info.get("blur_score", np.inf) < min_blur_score:
            skipped += 1
            continue
        img = next(
            (p for ext in (".jpg", ".jpeg", ".png")
             for p in [images_dir / f"{cam_json.stem}{ext}"] if p.exists()),
            None,
        )
        if img is None:
            skipped += 1
            continue
        rows = [[info[f"t_{r}{c}"] for c in range(4)] for r in range(3)]
        c2w = np.vstack([np.asarray(rows, np.float64), [0.0, 0.0, 0.0, 1.0]])
        frames.append(
            {
                "fl_x": info["fx"],
                "fl_y": info["fy"],
                "cx": info["cx"] - crop,
                "cy": info["cy"] - crop,
                "w": info["width"] - 2 * crop,
                "h": info["height"] - 2 * crop,
                "file_path": _stage_image(img, out_images, f"frame_{i:05d}{img.suffix}"),
                "transform_matrix": _cycle_world(c2w).tolist(),
            }
        )
    if not frames:
        raise ValueError(
            f"polycam import found no usable frames ({skipped} skipped; "
            f"min_blur_score={min_blur_score})"
        )
    meta = {
        "camera_model": "OPENCV",
        "orientation_override": "none",
        "frames": frames,
    }
    if skipped:
        print(f"[polycam] skipped {skipped} frames (blur/missing image)", flush=True)
    _write_transforms(Path(output_dir), meta)
    return meta


# ---------------------------------------------------------------------------
# Metashape
# ---------------------------------------------------------------------------


def metashape_to_transforms(
    xml_path: Path, images_dir: Path, output_dir: Path
) -> dict:
    """Import an Agisoft Metashape camera export (``doc.xml``).

    The XML stores one <sensor> calibration (f, cx/cy offsets from the
    image center, k1..k4/p1/p2) and per-<camera> 16-float row-major
    camera-to-world transforms with OpenCV camera axes. Cameras whose label
    has no matching image file, or no <transform>, are skipped.
    Reference: metashape_utils.py:37-131 (single-sensor constraint kept).
    """
    root = ET.parse(xml_path).getroot()
    chunk = root[0]
    sensors = chunk.find("sensors")
    if sensors is None or len(list(sensors)) != 1:
        raise ValueError("metashape import supports exactly one sensor")
    sensor = sensors.find("sensor")
    res = sensor.find("resolution")
    calib = sensor.find("calibration")
    w, h = int(res.get("width")), int(res.get("height"))

    def cal(name: str, default: float = 0.0) -> float:
        el = calib.find(name)
        return float(el.text) if el is not None else default

    meta = {
        "w": w,
        "h": h,
        "fl_x": cal("f"),
        "fl_y": cal("f"),
        # metashape principal point is an offset from the image center
        "cx": cal("cx") + w / 2.0,
        "cy": cal("cy") + h / 2.0,
        "k1": cal("k1"),
        "k2": cal("k2"),
        "k3": cal("k3"),
        "k4": cal("k4"),
        "p1": cal("p1"),
        "p2": cal("p2"),
        "camera_model": "OPENCV",
    }

    images_by_stem = {
        p.stem: p
        for p in sorted(Path(images_dir).iterdir())
        if p.suffix.lower() in (".jpg", ".jpeg", ".png")
    }
    opencv_to_gl = np.diag([1.0, -1.0, -1.0, 1.0])  # negate camera y,z axes
    frames, skipped = [], 0
    out_images = Path(output_dir) / "images"
    cameras = chunk.find("cameras")
    for camera in (cameras if cameras is not None else []):
        label = (camera.get("label") or "").split(".")[0]
        t_el = camera.find("transform")
        if label not in images_by_stem or t_el is None:
            skipped += 1
            continue
        t = np.fromstring(t_el.text, sep=" ").reshape(4, 4)
        c2w = _cycle_world(t @ opencv_to_gl)
        img = images_by_stem[label]
        frames.append(
            {
                "file_path": _stage_image(img, out_images, img.name),
                "transform_matrix": c2w.tolist(),
            }
        )
    if not frames:
        raise ValueError("metashape import found no frames with poses")
    if skipped:
        print(f"[metashape] skipped {skipped} cameras (no pose/image)", flush=True)
    meta["frames"] = frames
    _write_transforms(Path(output_dir), meta)
    return meta


# ---------------------------------------------------------------------------
# Record3D
# ---------------------------------------------------------------------------


def _quat_to_rotmat(q: np.ndarray) -> np.ndarray:
    """Batched xyzw quaternion -> rotation matrix ([N,4] -> [N,3,3])."""
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return np.stack(
        [
            np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            np.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def record3d_to_transforms(
    data_dir: Path, output_dir: Path, max_dataset_size: int = 300
) -> dict:
    """Import a Record3D capture (``metadata`` or ``metadata.json`` +
    ``rgbd/*.jpg``).

    The metadata stores per-frame poses as [qx,qy,qz,qw, tx,ty,tz]
    camera-to-world, a column-major 3x3 K, and the image size. When the
    capture has more frames than ``max_dataset_size``, frames are sampled
    evenly. The principal point is taken at the image center like the
    reference (its exported cx/cy misindex images; record3d_utils.py:76-77).
    Reference: record3d_utils.py:31-94.
    """
    data_dir = Path(data_dir)
    meta_path = next(
        (p for p in (data_dir / "metadata", data_dir / "metadata.json") if p.exists()),
        None,
    )
    if meta_path is None:
        raise FileNotFoundError(f"no record3d metadata under {data_dir}")
    md = json.loads(meta_path.read_text())

    images = sorted(
        (data_dir / "rgbd").glob("*.jpg"),
        key=lambda p: int(p.stem) if p.stem.isdigit() else p.stem,
    )
    if not images:
        raise FileNotFoundError(f"no frames under {data_dir / 'rgbd'}")
    poses = np.asarray(md["poses"], np.float64)  # [N, 7] quat(xyzw) + t
    n = min(len(images), len(poses))
    take = np.linspace(0, n - 1, min(n, max_dataset_size)).astype(int)

    rot = _quat_to_rotmat(poses[take, :4])
    c2w = np.zeros((len(take), 4, 4))
    c2w[:, :3, :3] = rot
    c2w[:, :3, 3] = poses[take, 4:]
    c2w[:, 3, 3] = 1.0

    K = np.asarray(md["K"], np.float64).reshape(3, 3).T  # stored column-major
    w_px, h_px = int(md["w"]), int(md["h"])
    out_images = Path(output_dir) / "images"
    frames = [
        {
            "file_path": _stage_image(images[j], out_images, images[j].name),
            "transform_matrix": c2w[i].tolist(),
        }
        for i, j in enumerate(take)
    ]
    meta = {
        "fl_x": float(K[0, 0]),
        "fl_y": float(K[0, 0]),
        "cx": w_px / 2.0,
        "cy": h_px / 2.0,
        "w": w_px,
        "h": h_px,
        "camera_model": "PERSPECTIVE",
        "frames": frames,
    }
    _write_transforms(Path(output_dir), meta)
    return meta
