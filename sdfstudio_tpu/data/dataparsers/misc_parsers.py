"""Smaller dataparsers: instant-ngp format, D-NeRF, Record3D, Friends.

Functional spec: reference nerfstudio/data/dataparsers/
{instant_ngp,dnerf,record3d,friends}_dataparser.py.
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import numpy as np

from sdfstudio_tpu.cameras.cameras import Cameras, CameraType
from sdfstudio_tpu.cameras import camera_utils
from sdfstudio_tpu.core.scene_box import SceneBox
from sdfstudio_tpu.data.dataparsers.base import (
    DataParser,
    DataParserConfig,
    DataparserOutputs,
)


@dataclasses.dataclass
class InstantNGPDataParserConfig(DataParserConfig):
    data: Path = Path("data/ours/posterv2")
    scene_scale: float = 0.33


class InstantNGP(DataParser):
    """instant-ngp transforms.json (aabb_scale, shared intrinsics;
    reference instant_ngp_dataparser.py:152)."""

    config: InstantNGPDataParserConfig

    def _generate_dataparser_outputs(self, split: str = "train") -> DataparserOutputs:
        cfg = self.config
        data = Path(cfg.data)
        meta = json.loads((data / "transforms.json").read_text())
        files, poses = [], []
        for frame in meta["frames"]:
            fname = data / Path(frame["file_path"])
            files.append(fname)
            poses.append(np.asarray(frame["transform_matrix"], np.float32))
        poses = np.stack(poses)
        camera_to_world = poses[:, :3]
        # ngp -> nerfstudio axis permutation (instant_ngp_dataparser.py)
        camera_to_world = camera_to_world[:, np.array([1, 0, 2]), :]
        camera_to_world[:, 2, :] *= -1

        aabb_scale = meta.get("aabb_scale", 1)
        scene_box = SceneBox(
            aabb=np.asarray(
                [[-aabb_scale, -aabb_scale, -aabb_scale], [aabb_scale, aabb_scale, aabb_scale]],
                np.float32,
            ),
            near=0.05,
            far=1000.0,
            collider_type="near_far",
        )
        k = camera_utils.get_distortion_params(
            k1=float(meta.get("k1", 0)),
            k2=float(meta.get("k2", 0)),
            p1=float(meta.get("p1", 0)),
            p2=float(meta.get("p2", 0)),
        )
        cameras = Cameras.create(
            camera_to_worlds=camera_to_world,
            fx=float(meta["fl_x"]),
            fy=float(meta["fl_y"]),
            cx=float(meta["cx"]),
            cy=float(meta["cy"]),
            width=int(meta["w"]),
            height=int(meta["h"]),
            distortion_params=np.tile(k, (len(files), 1)),
            camera_type=CameraType.PERSPECTIVE,
        )
        return DataparserOutputs(
            image_filenames=files,
            cameras=cameras,
            scene_box=scene_box,
            metadata={"height": int(meta["h"]), "width": int(meta["w"])},
        )


@dataclasses.dataclass
class DNeRFDataParserConfig(DataParserConfig):
    data: Path = Path("data/dnerf/lego")
    scale_factor: float = 1.0
    alpha_color: str = "white"


class DNeRF(DataParser):
    """Blender-style transforms with per-frame time (reference
    dnerf_dataparser.py:108)."""

    config: DNeRFDataParserConfig

    def _generate_dataparser_outputs(self, split: str = "train") -> DataparserOutputs:
        cfg = self.config
        data = Path(cfg.data)
        meta = json.loads((data / f"transforms_{split}.json").read_text())
        files, poses, times = [], [], []
        for frame in meta["frames"]:
            files.append(data / Path(frame["file_path"].replace("./", "") + ".png"))
            poses.append(np.asarray(frame["transform_matrix"], np.float32))
            times.append(frame.get("time", 0.0))
        poses = np.stack(poses)
        poses[:, :3, 3] *= cfg.scale_factor

        from PIL import Image

        with Image.open(files[0]) as im:
            W, H = im.size
        focal = 0.5 * W / np.tan(0.5 * float(meta["camera_angle_x"]))
        cameras = Cameras.create(
            camera_to_worlds=poses[:, :3, :4],
            fx=focal, fy=focal, cx=W / 2.0, cy=H / 2.0,
            width=W, height=H,
            times=np.asarray(times, np.float32),
        )
        scene_box = SceneBox(
            aabb=np.asarray([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32),
            near=2.0, far=6.0, collider_type="near_far",
        )
        alpha = np.ones(3, np.float32) if cfg.alpha_color == "white" else np.zeros(3, np.float32)
        return DataparserOutputs(
            image_filenames=files, cameras=cameras, scene_box=scene_box,
            alpha_color=alpha, metadata={"height": H, "width": W},
        )


@dataclasses.dataclass
class Record3DDataParserConfig(DataParserConfig):
    data: Path = Path("data/record3d/capture")
    val_skip: int = 8
    aabb_scale: float = 4.0
    max_dataset_size: int = 150


class Record3D(DataParser):
    """Record3D capture (metadata json + EXR/jpg frames; reference
    record3d_dataparser.py:160)."""

    config: Record3DDataParserConfig

    def _generate_dataparser_outputs(self, split: str = "train") -> DataparserOutputs:
        cfg = self.config
        data = Path(cfg.data)
        image_dir = data / "rgb"
        files = sorted(image_dir.glob("*.jpg")) + sorted(image_dir.glob("*.png"))
        meta = json.loads((data / "metadata").read_text())
        poses_data = np.asarray(meta["poses"], np.float32)  # [N, 7] quat+trans
        if len(files) > cfg.max_dataset_size:
            idx = np.round(np.linspace(0, len(files) - 1, cfg.max_dataset_size)).astype(int)
            files = [files[i] for i in idx]
            poses_data = poses_data[idx]
        # quaternion (x,y,z,w) + translation -> c2w
        c2ws = []
        for q_t in poses_data:
            x, y, z, w_, tx, ty, tz = q_t
            R = colmap_qvec_to_rot(np.array([w_, x, y, z]))
            c2w = np.eye(4, dtype=np.float32)
            c2w[:3, :3] = R
            c2w[:3, 3] = [tx, ty, tz]
            c2ws.append(c2w)
        c2ws = np.stack(c2ws)
        c2ws[:, 0:3, 1:3] *= -1

        K = np.asarray(meta["K"], np.float32).reshape(3, 3).T
        from PIL import Image

        with Image.open(files[0]) as im:
            W, H = im.size
        # intrinsics are for the capture resolution; rescale
        scale = W / meta.get("w", W)
        idx_all = np.arange(len(files))
        sel = idx_all[idx_all % cfg.val_skip != 0] if split == "train" else idx_all[:: cfg.val_skip]
        cameras = Cameras.create(
            camera_to_worlds=c2ws[sel, :3, :4],
            fx=K[0, 0] * scale, fy=K[1, 1] * scale,
            cx=K[0, 2] * scale, cy=K[1, 2] * scale,
            width=W, height=H,
        )
        s = cfg.aabb_scale
        scene_box = SceneBox(
            aabb=np.asarray([[-s, -s, -s], [s, s, s]], np.float32),
            near=0.05, far=100.0, collider_type="near_far",
        )
        return DataparserOutputs(
            image_filenames=[files[i] for i in sel], cameras=cameras, scene_box=scene_box,
        )


def colmap_qvec_to_rot(qvec: np.ndarray) -> np.ndarray:
    from sdfstudio_tpu.data.utils.colmap_utils import qvec2rotmat

    return qvec2rotmat(qvec)


@dataclasses.dataclass
class FriendsDataParserConfig(DataParserConfig):
    data: Path = Path("data/friends/TBBT-big_living_room")
    include_semantics: bool = True
    downscale_factor: int = 4
    scene_scale: float = 2.0


class Friends(DataParser):
    """Friends semantic dataset (cameras.json + semantic PNGs; reference
    friends_dataparser.py:150)."""

    config: FriendsDataParserConfig

    def _generate_dataparser_outputs(self, split: str = "train") -> DataparserOutputs:
        cfg = self.config
        data = Path(cfg.data)
        cams_json = json.loads((data / "cameras.json").read_text())
        frames = cams_json["frames"]
        files, poses, fx, fy, cx, cy = [], [], [], [], [], []
        for frame in frames:
            files.append(data / frame["file_path"])
            poses.append(np.asarray(frame["camtoworld"], np.float32))
            intr = np.asarray(frame["intrinsics"], np.float32)
            fx.append(intr[0, 0]), fy.append(intr[1, 1])
            cx.append(intr[0, 2]), cy.append(intr[1, 2])
        poses = np.stack(poses)
        poses[:, 0:3, 1:3] *= -1
        from PIL import Image

        with Image.open(files[0]) as im:
            W, H = im.size
        cameras = Cameras.create(
            camera_to_worlds=poses[:, :3, :4],
            fx=np.asarray(fx), fy=np.asarray(fy), cx=np.asarray(cx), cy=np.asarray(cy),
            width=W, height=H,
        )
        scene_box = SceneBox(
            aabb=np.asarray([[-1, -1, -1], [1, 1, 1]], np.float32) * cfg.scene_scale,
            near=0.05, far=20.0, collider_type="near_far",
        )
        semantics = None
        sem_dir = data / "segmentations" / "thing"
        if cfg.include_semantics and sem_dir.exists():
            semantics = [sem_dir / (Path(f).stem + ".png") for f in files]
        return DataparserOutputs(
            image_filenames=files, cameras=cameras, scene_box=scene_box,
            metadata={"semantics": semantics},
        )
