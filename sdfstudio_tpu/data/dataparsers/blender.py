"""Blender-synthetic dataparser (transforms_{split}.json).

Functional spec: reference nerfstudio/data/dataparsers/blender_dataparser.py
(camera_angle_x -> focal, OpenGL camera convention, white alpha composite,
aabb [-1.5, 1.5], scene scale factor).
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import numpy as np

from sdfstudio_tpu.cameras.cameras import Cameras, CameraType
from sdfstudio_tpu.core.scene_box import SceneBox
from sdfstudio_tpu.data.dataparsers.base import (
    DataParser,
    DataParserConfig,
    DataparserOutputs,
)


@dataclasses.dataclass
class BlenderDataParserConfig(DataParserConfig):
    data: Path = Path("data/blender/lego")
    scale_factor: float = 1.0
    alpha_color: str = "white"


class Blender(DataParser):
    config: BlenderDataParserConfig

    def _generate_dataparser_outputs(self, split: str = "train") -> DataparserOutputs:
        data = Path(self.config.data)
        meta = json.loads((data / f"transforms_{split}.json").read_text())
        image_filenames = []
        poses = []
        for frame in meta["frames"]:
            fname = data / Path(frame["file_path"].replace("./", "") + ".png")
            image_filenames.append(fname)
            poses.append(np.asarray(frame["transform_matrix"], np.float32))
        poses = np.stack(poses)
        poses[:, :3, 3] *= self.config.scale_factor

        from PIL import Image

        with Image.open(image_filenames[0]) as im:
            image_width, image_height = im.size
        camera_angle_x = float(meta["camera_angle_x"])
        focal = 0.5 * image_width / np.tan(0.5 * camera_angle_x)

        # Blender uses the OpenGL camera convention (x right, y up, z back) —
        # same as nerfstudio, so poses pass through unchanged.
        cameras = Cameras.create(
            camera_to_worlds=poses[:, :3, :4],
            fx=focal,
            fy=focal,
            cx=image_width / 2.0,
            cy=image_height / 2.0,
            width=image_width,
            height=image_height,
            camera_type=CameraType.PERSPECTIVE,
        )
        scene_box = SceneBox(
            aabb=np.asarray([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32),
            near=2.0,
            far=6.0,
            collider_type="near_far",
        )
        alpha = (
            np.ones(3, np.float32)
            if self.config.alpha_color == "white"
            else np.zeros(3, np.float32)
        )
        return DataparserOutputs(
            image_filenames=image_filenames,
            cameras=cameras,
            scene_box=scene_box,
            alpha_color=alpha,
            metadata={"height": image_height, "width": image_width},
        )
