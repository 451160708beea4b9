"""COLMAP-based dataparsers: mipnerf360, phototourism, heritage.

Functional spec: reference nerfstudio/data/dataparsers/
{mipnerf360,phototourism,heritage}_dataparser.py. All read a COLMAP sparse
model; heritage additionally builds the coarse binary occupancy grid from
the sparse point cloud (heritage_dataparser.py:297-338) used by
NeuralReconW, and loads per-image segmentation masks when present.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

import numpy as np

from sdfstudio_tpu.cameras import camera_utils
from sdfstudio_tpu.cameras.cameras import Cameras, CameraType
from sdfstudio_tpu.core.scene_box import SceneBox
from sdfstudio_tpu.data.dataparsers.base import (
    DataParser,
    DataParserConfig,
    DataparserOutputs,
)
from sdfstudio_tpu.data.utils import colmap_utils


def _load_colmap_cameras(data: Path, images_path: str = "images"):
    sparse_candidates = [
        data / "sparse" / "0",
        data / "sparse",
        data / "colmap" / "sparse" / "0",
        data / "dense" / "sparse",
    ]
    sparse = next((p for p in sparse_candidates if p.exists()), None)
    assert sparse is not None, f"no COLMAP sparse model under {data}"
    cams, imgs, pts = colmap_utils.read_model(sparse)

    image_filenames, poses = [], []
    fx, fy, cx, cy, widths, heights, distorts = [], [], [], [], [], [], []
    for img in sorted(imgs.values(), key=lambda im: im.name):
        cam = cams[img.camera_id]
        R = img.qvec2rotmat()
        t = img.tvec.reshape(3, 1)
        w2c = np.concatenate([np.concatenate([R, t], 1), np.array([[0, 0, 0, 1.0]])], 0)
        c2w = np.linalg.inv(w2c)
        # OpenCV -> nerfstudio convention
        c2w[0:3, 1:3] *= -1
        poses.append(c2w.astype(np.float32))
        image_filenames.append(data / images_path / img.name)
        if cam.model == "SIMPLE_PINHOLE":
            f, cx_, cy_ = cam.params[:3]
            fx.append(f), fy.append(f)
            k = np.zeros(6)
        elif cam.model == "PINHOLE":
            fx.append(cam.params[0]), fy.append(cam.params[1])
            cx_, cy_ = cam.params[2], cam.params[3]
            k = np.zeros(6)
        elif cam.model in ("SIMPLE_RADIAL", "RADIAL"):
            f = cam.params[0]
            fx.append(f), fy.append(f)
            cx_, cy_ = cam.params[1], cam.params[2]
            k = np.zeros(6)
            k[0] = cam.params[3]
            if cam.model == "RADIAL":
                k[1] = cam.params[4]
        elif cam.model == "OPENCV":
            fx.append(cam.params[0]), fy.append(cam.params[1])
            cx_, cy_ = cam.params[2], cam.params[3]
            k = np.zeros(6)
            k[0], k[1], k[4], k[5] = cam.params[4:8]
        else:
            raise ValueError(f"unsupported COLMAP camera model {cam.model}")
        cx.append(cx_), cy.append(cy_)
        widths.append(cam.width), heights.append(cam.height)
        distorts.append(k.astype(np.float32))
    return (
        image_filenames,
        np.stack(poses),
        np.asarray(fx, np.float32),
        np.asarray(fy, np.float32),
        np.asarray(cx, np.float32),
        np.asarray(cy, np.float32),
        np.asarray(widths, np.int32),
        np.asarray(heights, np.int32),
        np.stack(distorts),
        pts,
    )


@dataclasses.dataclass
class Mipnerf360DataParserConfig(DataParserConfig):
    data: Path = Path("data/mipnerf360/garden")
    downscale_factor: int = 1
    scene_scale: float = 1.0
    orientation_method: str = "up"
    center_poses: bool = True
    auto_scale_poses: bool = True
    train_split_percentage: float = 0.9
    images_path: str = "images"


class Mipnerf360(DataParser):
    config: Mipnerf360DataParserConfig

    def _generate_dataparser_outputs(self, split: str = "train") -> DataparserOutputs:
        cfg = self.config
        (files, poses, fx, fy, cx, cy, w, h, distorts, _) = _load_colmap_cameras(
            Path(cfg.data), cfg.images_path
        )
        oriented, transform = camera_utils.auto_orient_and_center_poses(
            poses, method=cfg.orientation_method, center_poses=cfg.center_poses
        )
        scale = 1.0
        if cfg.auto_scale_poses:
            scale /= float(np.max(np.abs(oriented[:, :3, 3])))
        oriented[:, :3, 3] *= scale

        n = len(files)
        num_train = int(np.ceil(n * cfg.train_split_percentage))
        i_train = np.linspace(0, n - 1, num_train, dtype=int)
        i_eval = np.setdiff1d(np.arange(n), i_train)
        sel = i_train if split == "train" else (i_eval if len(i_eval) else np.arange(n))

        cameras = Cameras.create(
            camera_to_worlds=oriented[sel, :3, :4],
            fx=fx[sel], fy=fy[sel], cx=cx[sel], cy=cy[sel],
            width=w[sel], height=h[sel],
            distortion_params=distorts[sel],
            camera_type=CameraType.PERSPECTIVE,
        )
        scene_box = SceneBox(
            aabb=np.asarray([[-1, -1, -1], [1, 1, 1]], np.float32) * cfg.scene_scale,
            near=0.05, far=1000.0, collider_type="near_far",
        )
        return DataparserOutputs(
            image_filenames=[files[i] for i in sel],
            cameras=cameras,
            scene_box=scene_box,
            metadata={"transform": transform, "scale": scale},
        )


@dataclasses.dataclass
class PhototourismDataParserConfig(Mipnerf360DataParserConfig):
    data: Path = Path("data/phototourism/brandenburg-gate")


class Phototourism(Mipnerf360):
    """Phototourism COLMAP captures (variable-resolution images;
    reference phototourism_dataparser.py:187)."""

    config: PhototourismDataParserConfig


@dataclasses.dataclass
class HeritageDataParserConfig(DataParserConfig):
    data: Path = Path("data/heritage/brandenburg_gate")
    images_path: str = "images"
    coarse_grid_resolution: int = 32
    min_track_length: int = 3
    voxel_margin: float = 0.05


class Heritage(DataParser):
    """Heritage (NeuralReconW) parser: COLMAP + coarse occupancy grid from
    the sparse cloud (reference heritage_dataparser.py:72-372)."""

    config: HeritageDataParserConfig

    def _generate_dataparser_outputs(self, split: str = "train") -> DataparserOutputs:
        cfg = self.config
        data = Path(cfg.data)
        (files, poses, fx, fy, cx, cy, w, h, distorts, pts) = _load_colmap_cameras(
            data, cfg.images_path
        )
        assert pts is not None, "heritage parser needs points3D in the sparse model"
        xyz = np.stack([p.xyz for p in pts.values()])
        track_len = np.asarray([len(p.image_ids) for p in pts.values()])
        xyz = xyz[track_len >= cfg.min_track_length]

        # robust bounds + normalization to unit sphere
        lo, hi = np.percentile(xyz, 2, axis=0), np.percentile(xyz, 98, axis=0)
        center = (lo + hi) / 2.0
        radius = float(np.max(hi - lo)) / 2.0 * (1 + cfg.voxel_margin)
        poses[:, :3, 3] = (poses[:, :3, 3] - center) / radius
        xyz = (xyz - center) / radius

        # coarse binary occupancy grid from the sparse cloud
        # (heritage_dataparser.py:297-338)
        res = cfg.coarse_grid_resolution
        ijk = np.clip(((xyz + 1.0) / 2.0 * res).astype(int), 0, res - 1)
        grid = np.zeros((res, res, res), bool)
        grid[ijk[:, 0], ijk[:, 1], ijk[:, 2]] = True
        # dilate one voxel
        from numpy.lib.stride_tricks import sliding_window_view  # noqa: F401

        dil = grid.copy()
        for ax in range(3):
            dil |= np.roll(grid, 1, axis=ax) | np.roll(grid, -1, axis=ax)

        scene_box = SceneBox(
            aabb=np.asarray([[-1, -1, -1], [1, 1, 1]], np.float32),
            near=0.01,
            far=4.0,
            radius=1.0,
            collider_type="sphere",
            coarse_binary_grid=dil,
        )
        n = len(files)
        sel = np.arange(n) if split == "train" else np.arange(min(n, 10))
        masks = None
        mask_dir = data / "masks"
        if mask_dir.exists():
            from sdfstudio_tpu.data.dataparsers.base import load_image

            masks = []
            for f in [files[i] for i in sel]:
                mp = mask_dir / (Path(f).stem + ".png")
                masks.append(load_image(mp)[..., :1] if mp.exists() else None)
            if any(m is None for m in masks):
                masks = None

        cameras = Cameras.create(
            camera_to_worlds=poses[sel, :3, :4],
            fx=fx[sel], fy=fy[sel], cx=cx[sel], cy=cy[sel],
            width=w[sel], height=h[sel],
            distortion_params=distorts[sel],
            camera_type=CameraType.PERSPECTIVE,
        )
        return DataparserOutputs(
            image_filenames=[files[i] for i in sel],
            cameras=cameras,
            scene_box=scene_box,
            fg_masks=masks,
            metadata={"sparse_points": xyz},
        )
