"""Nerfstudio-format dataparser (transforms.json).

Functional spec: reference nerfstudio/data/dataparsers/nerfstudio_dataparser.py
(per-frame or shared intrinsics, distortion params, orientation/centering,
auto scaling, train/eval fraction split).
"""
from __future__ import annotations

import dataclasses
import json
import math
from pathlib import Path

import numpy as np

from sdfstudio_tpu.cameras import camera_utils
from sdfstudio_tpu.cameras.cameras import CAMERA_MODEL_TO_TYPE, Cameras, CameraType
from sdfstudio_tpu.core.scene_box import SceneBox
from sdfstudio_tpu.data.dataparsers.base import (
    DataParser,
    DataParserConfig,
    DataparserOutputs,
)

MAX_AUTO_RESOLUTION = 1600


@dataclasses.dataclass
class NerfstudioDataParserConfig(DataParserConfig):
    data: Path = Path("data/nerfstudio/poster")
    scale_factor: float = 1.0
    downscale_factor: int | None = None
    scene_scale: float = 1.0
    orientation_method: str = "up"  # up | pca | none
    center_poses: bool = True
    auto_scale_poses: bool = True
    train_split_percentage: float = 0.9


class Nerfstudio(DataParser):
    config: NerfstudioDataParserConfig

    def _generate_dataparser_outputs(self, split: str = "train") -> DataparserOutputs:
        cfg = self.config
        data = Path(cfg.data)
        meta = json.loads((data / "transforms.json").read_text())

        image_filenames, poses = [], []
        fx, fy, cx, cy, height, width, distort = [], [], [], [], [], [], []

        def get(frame, key):
            return frame.get(key, meta.get(key))

        for frame in meta["frames"]:
            fname = data / Path(frame["file_path"])
            if not fname.exists() and (data / "images" / Path(frame["file_path"]).name).exists():
                fname = data / "images" / Path(frame["file_path"]).name
            image_filenames.append(fname)
            poses.append(np.asarray(frame["transform_matrix"], np.float32))
            fx.append(float(get(frame, "fl_x")))
            fy.append(float(get(frame, "fl_y")))
            cx.append(float(get(frame, "cx")))
            cy.append(float(get(frame, "cy")))
            height.append(int(get(frame, "h")))
            width.append(int(get(frame, "w")))
            distort.append(
                camera_utils.get_distortion_params(
                    k1=float(get(frame, "k1") or 0),
                    k2=float(get(frame, "k2") or 0),
                    k3=float(get(frame, "k3") or 0),
                    k4=float(get(frame, "k4") or 0),
                    p1=float(get(frame, "p1") or 0),
                    p2=float(get(frame, "p2") or 0),
                )
            )

        num_images = len(image_filenames)
        num_train = math.ceil(num_images * cfg.train_split_percentage)
        i_all = np.arange(num_images)
        i_train = np.linspace(0, num_images - 1, num_train, dtype=int)
        i_eval = np.setdiff1d(i_all, i_train)
        indices = i_train if split == "train" else i_eval
        if len(indices) == 0:
            indices = i_all

        poses = np.stack(poses)
        oriented, transform = camera_utils.auto_orient_and_center_poses(
            poses, method=cfg.orientation_method, center_poses=cfg.center_poses
        )
        scale = 1.0
        if cfg.auto_scale_poses:
            scale /= float(np.max(np.abs(oriented[:, :3, 3])))
        scale *= cfg.scale_factor
        oriented[:, :3, 3] *= scale

        aabb = cfg.scene_scale
        scene_box = SceneBox(
            aabb=np.asarray([[-aabb] * 3, [aabb] * 3], np.float32),
            near=0.05,
            far=1000.0,
            collider_type="near_far",
        )

        cam_type = CAMERA_MODEL_TO_TYPE.get(
            meta.get("camera_model", "OPENCV"), CameraType.PERSPECTIVE
        )
        sel = np.asarray(indices)
        cameras = Cameras.create(
            camera_to_worlds=oriented[sel, :3, :4],
            fx=np.asarray(fx, np.float32)[sel],
            fy=np.asarray(fy, np.float32)[sel],
            cx=np.asarray(cx, np.float32)[sel],
            cy=np.asarray(cy, np.float32)[sel],
            width=np.asarray(width, np.int32)[sel],
            height=np.asarray(height, np.int32)[sel],
            distortion_params=np.stack(distort)[sel],
            camera_type=cam_type,
        )
        return DataparserOutputs(
            image_filenames=[image_filenames[i] for i in indices],
            cameras=cameras,
            scene_box=scene_box,
            metadata={"transform": transform, "scale_factor": scale},
        )
