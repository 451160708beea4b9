"""SDFStudio-format dataparser (meta_data.json).

Functional spec: reference nerfstudio/data/dataparsers/sdfstudio_dataparser.py:137-426
and docs/sdfstudio-data.md: meta_data.json holds camera_model/height/width/
scene_box{aabb,near,far,radius,collider_type}/has_* flags and per-frame
rgb_path/camtoworld/intrinsics/mono_depth_path/mono_normal_path/... .
"""
from __future__ import annotations

import dataclasses
import json
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
    load_image,
)


@dataclasses.dataclass
class SDFStudioDataParserConfig(DataParserConfig):
    """Mirror of reference SDFStudioDataParserConfig (sdfstudio_dataparser.py:137-178)."""

    data: Path = Path("data/DTU/scan65")
    include_mono_prior: bool = False
    include_sensor_depth: bool = False
    include_foreground_mask: bool = False
    include_sfm_points: bool = False
    scale_factor: float = 1.0
    orientation_method: str = "up"
    center_poses: bool = False
    auto_scale_poses: bool = False
    load_pairs: bool = False
    neighbors_num: Optional[int] = None
    neighbors_shuffle: bool = False
    pairs_sorted_ascending: bool = True
    skip_every_for_val_split: int = 1
    train_val_no_overlap: bool = False
    auto_orient: bool = False


class SDFStudio(DataParser):
    config: SDFStudioDataParserConfig

    def _generate_dataparser_outputs(self, split: str = "train") -> DataparserOutputs:
        cfg = self.config
        data = Path(cfg.data)
        meta = json.loads((data / "meta_data.json").read_text())

        indices = list(range(len(meta["frames"])))
        if split != "train" and cfg.skip_every_for_val_split >= 1:
            indices = indices[:: cfg.skip_every_for_val_split]
        elif cfg.train_val_no_overlap:
            indices = [i for i in indices if i % cfg.skip_every_for_val_split != 0]

        image_filenames, depth_images, normal_images = [], [], []
        sensor_depth_images, fg_mask_images, sfm_points = [], [], []
        fx, fy, cx, cy, c2ws = [], [], [], [], []

        for frame in meta["frames"]:
            image_filenames.append(data / frame["rgb_path"])
            intr = np.asarray(frame["intrinsics"], np.float32)
            c2w = np.asarray(frame["camtoworld"], np.float32)

            if cfg.include_mono_prior:
                assert meta["has_mono_prior"]
                depth = np.load(data / frame["mono_depth_path"]).astype(np.float32)
                depth_images.append(depth)
                normal = np.load(data / frame["mono_normal_path"]).astype(np.float32)
                # omnidata outputs are in [0,1]; map to [-1,1] then rotate to
                # world (sdfstudio_dataparser.py:244-255)
                normal = normal * 2.0 - 1.0
                rot = c2w[:3, :3]
                nm = normal.reshape(3, -1)
                nm = nm / np.maximum(np.linalg.norm(nm, axis=0, keepdims=True), 1e-12)
                nm = rot @ nm
                normal_images.append(nm.T.reshape(*normal.shape[1:], 3))

            if cfg.include_sensor_depth:
                assert meta["has_sensor_depth"]
                sensor_depth_images.append(
                    np.load(data / frame["sensor_depth_path"]).astype(np.float32)
                )

            if cfg.include_foreground_mask:
                assert meta["has_foreground_mask"]
                m = load_image(data / frame["foreground_mask"])
                fg_mask_images.append(m[..., :1])

            if cfg.include_sfm_points:
                assert meta["has_sparse_sfm_points"]
                sfm_points.append(
                    np.loadtxt(data / frame["sfm_sparse_points_view"]).astype(np.float32)
                )

            fx.append(intr[0, 0])
            fy.append(intr[1, 1])
            cx.append(intr[0, 2])
            cy.append(intr[1, 2])
            c2ws.append(c2w)

        c2ws = np.stack(c2ws)
        # OpenCV -> nerfstudio camera convention (sdfstudio_dataparser.py:301)
        c2ws[:, 0:3, 1:3] *= -1

        if cfg.auto_orient:
            method = meta.get("orientation_override", cfg.orientation_method)
            oriented, transform = camera_utils.auto_orient_and_center_poses(
                c2ws, method=method, center_poses=cfg.center_poses
            )
            c2ws = np.concatenate(
                [oriented, np.tile(np.asarray([[[0, 0, 0, 1.0]]], np.float32), (len(oriented), 1, 1))],
                axis=1,
            )
            normal_images = [
                (transform[:3, :3] @ n.reshape(-1, 3).T).T.reshape(n.shape)
                for n in normal_images
            ]

        scale = 1.0
        if cfg.auto_scale_poses:
            scale /= float(np.max(np.abs(c2ws[:, :3, 3])))
        scale *= cfg.scale_factor
        c2ws[:, :3, 3] *= scale

        msb = meta["scene_box"]
        scene_box = SceneBox(
            aabb=np.asarray(msb["aabb"], np.float32),
            near=msb["near"],
            far=msb["far"],
            radius=msb["radius"],
            collider_type=msb["collider_type"],
        )

        height, width = meta["height"], meta["width"]
        sel = np.asarray(indices)
        cameras = Cameras.create(
            camera_to_worlds=c2ws[sel, :3, :4],
            fx=np.asarray(fx, np.float32)[sel],
            fy=np.asarray(fy, np.float32)[sel],
            cx=np.asarray(cx, np.float32)[sel],
            cy=np.asarray(cy, np.float32)[sel],
            width=width,
            height=height,
            camera_type=CameraType.PERSPECTIVE,
        )

        pairs_srcs = None
        pairs_path = data / "pairs.txt"
        if pairs_path.exists() and split == "train" and cfg.load_pairs:
            pairs = pairs_path.read_text().splitlines()
            pairs_srcs = []
            for line in pairs:
                arr = [int(name.split(".")[0]) for name in line.split(" ")]
                if cfg.pairs_sorted_ascending:
                    arr = [arr[0]] + arr[:1:-1]
                pairs_srcs.append(arr)
            pairs_srcs = np.asarray(pairs_srcs)

        def pick(lst):
            return [lst[i] for i in indices] if lst else None

        return DataparserOutputs(
            image_filenames=[image_filenames[i] for i in indices],
            cameras=cameras,
            scene_box=scene_box,
            depths=pick(depth_images),
            normals=pick(normal_images),
            sensor_depths=pick(sensor_depth_images),
            fg_masks=pick(fg_mask_images),
            sparse_sfm_points=pick(sfm_points),
            pairs_srcs=pairs_srcs,
            metadata={"height": height, "width": width},
        )
