"""COLMAP sparse-model readers (cameras / images / points3D, bin + txt).

Functional spec: reference nerfstudio/data/utils/colmap_utils.py:303 (itself
derived from the public COLMAP scripts). Pure numpy, no external deps.
"""
from __future__ import annotations

import dataclasses
import struct
from pathlib import Path
from typing import Dict

import numpy as np

CAMERA_MODEL_IDS = {
    0: ("SIMPLE_PINHOLE", 3),
    1: ("PINHOLE", 4),
    2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5),
    4: ("OPENCV", 8),
    5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12),
    7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}
CAMERA_MODEL_NAMES = {name: (mid, n) for mid, (name, n) in CAMERA_MODEL_IDS.items()}


@dataclasses.dataclass
class ColmapCamera:
    id: int
    model: str
    width: int
    height: int
    params: np.ndarray


@dataclasses.dataclass
class ColmapImage:
    id: int
    qvec: np.ndarray  # [w, x, y, z]
    tvec: np.ndarray
    camera_id: int
    name: str
    xys: np.ndarray
    point3D_ids: np.ndarray

    def qvec2rotmat(self) -> np.ndarray:
        return qvec2rotmat(self.qvec)


@dataclasses.dataclass
class ColmapPoint3D:
    id: int
    xyz: np.ndarray
    rgb: np.ndarray
    error: float
    image_ids: np.ndarray
    point2D_idxs: np.ndarray


def qvec2rotmat(qvec: np.ndarray) -> np.ndarray:
    w, x, y, z = qvec
    return np.array(
        [
            [1 - 2 * y**2 - 2 * z**2, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
            [2 * x * y + 2 * z * w, 1 - 2 * x**2 - 2 * z**2, 2 * y * z - 2 * x * w],
            [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x**2 - 2 * y**2],
        ]
    )


def rotmat2qvec(R: np.ndarray) -> np.ndarray:
    Rxx, Ryx, Rzx, Rxy, Ryy, Rzy, Rxz, Ryz, Rzz = R.flat
    K = (
        np.array(
            [
                [Rxx - Ryy - Rzz, 0, 0, 0],
                [Ryx + Rxy, Ryy - Rxx - Rzz, 0, 0],
                [Rzx + Rxz, Rzy + Ryz, Rzz - Rxx - Ryy, 0],
                [Ryz - Rzy, Rzx - Rxz, Rxy - Ryx, Rxx + Ryy + Rzz],
            ]
        )
        / 3.0
    )
    eigvals, eigvecs = np.linalg.eigh(K)
    qvec = eigvecs[np.array([3, 0, 1, 2]), np.argmax(eigvals)]
    if qvec[0] < 0:
        qvec *= -1
    return qvec


def _read_next_bytes(fid, num_bytes, fmt, endian="<"):
    return struct.unpack(endian + fmt, fid.read(num_bytes))


def read_cameras_binary(path: Path) -> Dict[int, ColmapCamera]:
    cameras = {}
    with open(path, "rb") as f:
        num = _read_next_bytes(f, 8, "Q")[0]
        for _ in range(num):
            cam_id, model_id, w, h = _read_next_bytes(f, 24, "iiQQ")
            name, n_params = CAMERA_MODEL_IDS[model_id]
            params = np.array(_read_next_bytes(f, 8 * n_params, "d" * n_params))
            cameras[cam_id] = ColmapCamera(cam_id, name, w, h, params)
    return cameras


def read_images_binary(path: Path) -> Dict[int, ColmapImage]:
    images = {}
    with open(path, "rb") as f:
        num = _read_next_bytes(f, 8, "Q")[0]
        for _ in range(num):
            vals = _read_next_bytes(f, 64, "idddddddi")
            img_id = vals[0]
            qvec = np.array(vals[1:5])
            tvec = np.array(vals[5:8])
            cam_id = vals[8]
            name = b""
            c = f.read(1)
            while c != b"\x00":
                name += c
                c = f.read(1)
            n_pts = _read_next_bytes(f, 8, "Q")[0]
            data = _read_next_bytes(f, 24 * n_pts, "ddq" * n_pts)
            xys = np.array(data).reshape(-1, 3)[:, :2] if n_pts else np.zeros((0, 2))
            ids = (
                np.array(data).reshape(-1, 3)[:, 2].astype(np.int64)
                if n_pts
                else np.zeros(0, np.int64)
            )
            images[img_id] = ColmapImage(img_id, qvec, tvec, cam_id, name.decode(), xys, ids)
    return images


def read_points3d_binary(path: Path) -> Dict[int, ColmapPoint3D]:
    points = {}
    with open(path, "rb") as f:
        num = _read_next_bytes(f, 8, "Q")[0]
        for _ in range(num):
            vals = _read_next_bytes(f, 43, "QdddBBBd")
            pid = vals[0]
            xyz = np.array(vals[1:4])
            rgb = np.array(vals[4:7])
            error = vals[7]
            track_len = _read_next_bytes(f, 8, "Q")[0]
            track = _read_next_bytes(f, 8 * track_len, "ii" * track_len)
            points[pid] = ColmapPoint3D(
                pid,
                xyz,
                rgb,
                error,
                np.array(track[0::2]),
                np.array(track[1::2]),
            )
    return points


def read_cameras_text(path: Path) -> Dict[int, ColmapCamera]:
    cameras = {}
    for line in Path(path).read_text().splitlines():
        if line.startswith("#") or not line.strip():
            continue
        elems = line.split()
        cam_id = int(elems[0])
        cameras[cam_id] = ColmapCamera(
            cam_id, elems[1], int(elems[2]), int(elems[3]), np.array(elems[4:], float)
        )
    return cameras


def read_images_text(path: Path) -> Dict[int, ColmapImage]:
    images = {}
    # keep empty lines: images with zero 2D observations have a blank
    # POINTS2D line, and dropping it would desynchronize the meta/points
    # pairing for every image after it
    raw = [l for l in Path(path).read_text().splitlines() if not l.startswith("#")]
    lines = []
    expecting_points = False
    for l in raw:
        if not l.strip() and not expecting_points:
            continue  # stray blank between records
        lines.append(l)
        expecting_points = not expecting_points
    if expecting_points:
        lines.append("")  # trailing image with no points line
    for meta_line, pts_line in zip(lines[0::2], lines[1::2]):
        elems = meta_line.split()
        img_id = int(elems[0])
        qvec = np.array(elems[1:5], float)
        tvec = np.array(elems[5:8], float)
        cam_id = int(elems[8])
        name = elems[9]
        pts = np.array(pts_line.split(), float).reshape(-1, 3) if pts_line.split() else np.zeros((0, 3))
        images[img_id] = ColmapImage(
            img_id, qvec, tvec, cam_id, name, pts[:, :2], pts[:, 2].astype(np.int64)
        )
    return images


def read_points3d_text(path: Path) -> Dict[int, ColmapPoint3D]:
    """POINT3D_ID X Y Z R G B ERROR (IMAGE_ID POINT2D_IDX)*"""
    points = {}
    for line in Path(path).read_text().splitlines():
        if line.startswith("#") or not line.strip():
            continue
        elems = line.split()
        pid = int(elems[0])
        track = np.array(elems[8:], dtype=np.int64).reshape(-1, 2)
        points[pid] = ColmapPoint3D(
            pid,
            np.array(elems[1:4], float),
            np.array(elems[4:7], float),
            float(elems[7]),
            track[:, 0],
            track[:, 1],
        )
    return points


def read_model(sparse_dir: Path):
    """Auto-detect bin/txt model; returns (cameras, images, points or None)."""
    sparse_dir = Path(sparse_dir)
    if (sparse_dir / "cameras.bin").exists():
        cams = read_cameras_binary(sparse_dir / "cameras.bin")
        imgs = read_images_binary(sparse_dir / "images.bin")
        pts = (
            read_points3d_binary(sparse_dir / "points3D.bin")
            if (sparse_dir / "points3D.bin").exists()
            else None
        )
    else:
        cams = read_cameras_text(sparse_dir / "cameras.txt")
        imgs = read_images_text(sparse_dir / "images.txt")
        pts = (
            read_points3d_text(sparse_dir / "points3D.txt")
            if (sparse_dir / "points3D.txt").exists()
            else None
        )
    return cams, imgs, pts


# ---------------------------------------------------------------------------
# Text-model writers (COLMAP sparse text format; used by the synthetic
# heritage-like benchmark scene and hermetic tests)
# ---------------------------------------------------------------------------


def write_cameras_text(cameras: Dict[int, ColmapCamera], path: Path) -> None:
    lines = ["# Camera list: CAMERA_ID MODEL WIDTH HEIGHT PARAMS[]"]
    for cam in cameras.values():
        params = " ".join(f"{p:.10g}" for p in np.asarray(cam.params).ravel())
        lines.append(f"{cam.id} {cam.model} {cam.width} {cam.height} {params}")
    Path(path).write_text("\n".join(lines) + "\n")


def write_images_text(images: Dict[int, ColmapImage], path: Path) -> None:
    lines = ["# Image list: IMAGE_ID QW QX QY QZ TX TY TZ CAMERA_ID NAME / POINTS2D"]
    for im in images.values():
        q = " ".join(f"{v:.10g}" for v in np.asarray(im.qvec).ravel())
        t = " ".join(f"{v:.10g}" for v in np.asarray(im.tvec).ravel())
        lines.append(f"{im.id} {q} {t} {im.camera_id} {im.name}")
        obs = " ".join(
            f"{xy[0]:.4f} {xy[1]:.4f} {int(pid)}"
            for xy, pid in zip(im.xys, im.point3D_ids)
        )
        lines.append(obs)
    Path(path).write_text("\n".join(lines) + "\n")


def write_points3d_text(points: Dict[int, ColmapPoint3D], path: Path) -> None:
    lines = ["# 3D point list: POINT3D_ID X Y Z R G B ERROR TRACK[]"]
    for pt in points.values():
        xyz = " ".join(f"{v:.10g}" for v in np.asarray(pt.xyz).ravel())
        rgb = " ".join(str(int(v)) for v in np.asarray(pt.rgb).ravel())
        track = " ".join(
            f"{int(i)} {int(j)}" for i, j in zip(pt.image_ids, pt.point2D_idxs)
        )
        lines.append(f"{pt.id} {xyz} {rgb} {pt.error:.6g} {track}")
    Path(path).write_text("\n".join(lines) + "\n")
