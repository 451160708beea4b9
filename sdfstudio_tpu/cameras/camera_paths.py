"""Render-trajectory camera paths.

Functional spec: reference nerfstudio/cameras/camera_paths.py:243 —
interpolated paths between dataset cameras, spiral paths, and viewer-JSON
paths for ns-render.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from sdfstudio_tpu.cameras import camera_utils
from sdfstudio_tpu.cameras.cameras import Cameras


def get_interpolated_camera_path(cameras: Cameras, steps: int) -> Cameras:
    """Interpolate between all dataset cameras (reference camera_paths.py:29-54)."""
    c2ws = np.asarray(cameras.camera_to_worlds)
    poses = []
    per_pair = max(steps // max(len(c2ws) - 1, 1), 1)
    for i in range(len(c2ws) - 1):
        poses.append(camera_utils.get_interpolated_poses(c2ws[i], c2ws[i + 1], steps=per_pair))
    poses = np.concatenate(poses, axis=0)
    n = len(poses)
    return Cameras.create(
        camera_to_worlds=poses[:, :3, :4],
        fx=float(np.asarray(cameras.fx)[0]),
        fy=float(np.asarray(cameras.fy)[0]),
        cx=float(np.asarray(cameras.cx)[0]),
        cy=float(np.asarray(cameras.cy)[0]),
        width=int(np.asarray(cameras.width)[0]),
        height=int(np.asarray(cameras.height)[0]),
    )


def get_spiral_path(
    camera: Cameras,
    steps: int = 30,
    radius: float = 0.1,
    rots: int = 2,
    zrate: float = 0.5,
) -> Cameras:
    """Spiral path around camera 0 (reference camera_paths.py:57-110)."""
    c2w = np.asarray(camera.camera_to_worlds)[0]
    up = c2w[:3, 1]
    focal = float(np.asarray(camera.fx)[0])
    target = c2w[:3, 3] + c2w[:3, 2] * -1.0  # point in front of the camera

    local_poses = []
    for theta in np.linspace(0.0, 2.0 * np.pi * rots, steps + 1)[:-1]:
        center = c2w[:3, 3] + radius * np.array(
            [np.cos(theta), -np.sin(theta), -np.sin(theta * zrate)]
        )
        lookat = center - target
        pose = camera_utils.viewmatrix(-lookat, up, center)
        local_poses.append(pose)
    poses = np.stack(local_poses)
    return Cameras.create(
        camera_to_worlds=poses,
        fx=float(np.asarray(camera.fx)[0]),
        fy=float(np.asarray(camera.fy)[0]),
        cx=float(np.asarray(camera.cx)[0]),
        cy=float(np.asarray(camera.cy)[0]),
        width=int(np.asarray(camera.width)[0]),
        height=int(np.asarray(camera.height)[0]),
    )


def get_path_from_json(camera_path: Dict) -> Cameras:
    """Viewer-exported camera path JSON (reference camera_paths.py:113-151)."""
    image_height = camera_path["render_height"]
    image_width = camera_path["render_width"]
    c2ws, fxs, fys = [], [], []
    for cam in camera_path["camera_path"]:
        c2w = np.asarray(cam["camera_to_world"], np.float32).reshape(4, 4)[:3]
        c2ws.append(c2w)
        fov = cam["fov"]
        focal = image_height / 2.0 / np.tan(np.deg2rad(fov) / 2.0)
        fxs.append(focal)
        fys.append(focal)
    return Cameras.create(
        camera_to_worlds=np.stack(c2ws),
        fx=np.asarray(fxs, np.float32),
        fy=np.asarray(fys, np.float32),
        cx=image_width / 2.0,
        cy=image_height / 2.0,
        width=image_width,
        height=image_height,
    )
