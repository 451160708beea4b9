"""MonoSDF-format dataparser (cameras.npz + *_rgb.png + mono cues).

Functional spec: reference nerfstudio/data/dataparsers/monosdf_dataparser.py:124-343
(P = world_mat @ scale_mat decomposition, center-crop intrinsic adjustments
for omnidata, mono depth/normal .npy, pairs).
"""
from __future__ import annotations

import dataclasses
from glob import glob
from pathlib import Path
from typing import Optional

import numpy as np

from sdfstudio_tpu.cameras.cameras import Cameras, CameraType
from sdfstudio_tpu.core.scene_box import SceneBox
from sdfstudio_tpu.data.dataparsers.base import (
    DataParser,
    DataParserConfig,
    DataparserOutputs,
)


def load_K_Rt_from_P(P: np.ndarray):
    """Decompose a 3x4 projection into K and c2w pose (monosdf convention,
    reference monosdf_dataparser.py load_K_Rt_from_P)."""
    import cv2

    out = cv2.decomposeProjectionMatrix(P)
    K, R, t = out[0], out[1], out[2]
    K = K / K[2, 2]
    intrinsics = np.eye(4)
    intrinsics[:3, :3] = K
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.T
    pose[:3, 3] = (t[:3] / t[3])[:, 0]
    return intrinsics, pose


@dataclasses.dataclass
class MonoSDFDataParserConfig(DataParserConfig):
    data: Path = Path("data/DTU/scan65")
    include_mono_prior: bool = False
    downscale_factor: int = 1
    scene_scale: float = 2.0
    center_crop_type: str = "center_crop_for_dtu"
    load_pairs: bool = False
    neighbors_num: Optional[int] = None
    pairs_sorted_ascending: bool = True
    skip_every_for_val_split: int = 1


class MonoSDFScene(DataParser):
    config: MonoSDFDataParserConfig

    def _generate_dataparser_outputs(self, split: str = "train") -> DataparserOutputs:
        cfg = self.config
        data = Path(cfg.data)
        image_paths = sorted(glob(str(data / "*_rgb.png")))
        depth_paths = sorted(glob(str(data / "*_depth.npy")))
        normal_paths = sorted(glob(str(data / "*_normal.npy")))
        n = len(image_paths)
        cams = np.load(data / "cameras.npz")
        fx, fy, cx, cy, c2ws = [], [], [], [], []
        for i in range(n):
            P = (cams[f"world_mat_{i}"].astype(np.float32) @ cams[f"scale_mat_{i}"].astype(np.float32))[:3, :4]
            intr, pose = load_K_Rt_from_P(P)
            # omnidata center-crop intrinsic adjustments
            # (monosdf_dataparser.py:193-216)
            if cfg.center_crop_type == "center_crop_for_replica":
                scale, offset = 384 / 680, (1200 - 680) * 0.5
            elif cfg.center_crop_type == "center_crop_for_tnt":
                scale, offset = 384 / 540, (960 - 540) * 0.5
            elif cfg.center_crop_type == "center_crop_for_dtu":
                scale, offset = 384 / 1200, (1600 - 1200) * 0.5
            else:
                scale, offset = 1.0, 0.0
            intr = intr.copy()
            intr[0, 2] -= offset
            intr[:2, :] *= scale
            fx.append(intr[0, 0])
            fy.append(intr[1, 1])
            cx.append(intr[0, 2])
            cy.append(intr[1, 2])
            c2ws.append(pose)

        c2ws = np.stack(c2ws)
        # OpenCV -> nerfstudio convention
        c2ws[:, 0:3, 1:3] *= -1

        from PIL import Image

        with Image.open(image_paths[0]) as im:
            W, H = im.size

        depths, normals = None, None
        if cfg.include_mono_prior:
            depths = [np.load(p).astype(np.float32) for p in depth_paths]
            normals = []
            for p, c2w in zip(normal_paths, c2ws):
                nrm = np.load(p).astype(np.float32) * 2.0 - 1.0
                rot = c2w[:3, :3].copy()
                # back to opencv for the rotation (parser flips after)
                rot[:, 1:3] *= -1
                nm = nrm.reshape(3, -1)
                nm = nm / np.maximum(np.linalg.norm(nm, axis=0, keepdims=True), 1e-12)
                normals.append((rot @ nm).T.reshape(*nrm.shape[1:], 3))

        indices = list(range(n))
        if split != "train" and cfg.skip_every_for_val_split >= 1:
            indices = indices[:: cfg.skip_every_for_val_split]
        sel = np.asarray(indices)

        cameras = Cameras.create(
            camera_to_worlds=c2ws[sel, :3, :4],
            fx=np.asarray(fx, np.float32)[sel],
            fy=np.asarray(fy, np.float32)[sel],
            cx=np.asarray(cx, np.float32)[sel],
            cy=np.asarray(cy, np.float32)[sel],
            width=W,
            height=H,
            camera_type=CameraType.PERSPECTIVE,
        )
        scene_box = SceneBox(
            aabb=np.asarray([[-1, -1, -1], [1, 1, 1]], np.float32) * cfg.scene_scale / 2.0,
            near=0.05,
            far=2.5,
            radius=1.0,
            collider_type="near_far",
        )
        pairs_srcs = None
        pairs_path = data / "pairs.txt"
        if pairs_path.exists() and split == "train" and cfg.load_pairs:
            pairs_srcs = []
            for line in pairs_path.read_text().splitlines():
                arr = [int(name.split(".")[0]) for name in line.split(" ")]
                if cfg.pairs_sorted_ascending:
                    arr = [arr[0]] + arr[:1:-1]
                pairs_srcs.append(arr)
            pairs_srcs = np.asarray(pairs_srcs)

        def pick(lst):
            return [lst[i] for i in indices] if lst else None

        return DataparserOutputs(
            image_filenames=[Path(image_paths[i]) for i in indices],
            cameras=cameras,
            scene_box=scene_box,
            depths=pick(depths),
            normals=pick(normals),
            pairs_srcs=pairs_srcs,
            metadata={"height": H, "width": W},
        )
