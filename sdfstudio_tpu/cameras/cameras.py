"""Batched cameras + on-device ray generation.

Functional spec: reference nerfstudio/cameras/cameras.py:36-771. The
Cameras container is a flax.struct pytree so ray generation runs INSIDE the
jitted train step (pixel indices -> RayBundle entirely on device — the
reference generates rays on CPU per batch, cameras.py:304).

Camera-type dispatch is branch-free: all three direction formulas are
computed and selected per-ray with ``jnp.where`` (cheap VPU work) instead of
the reference's masked_select scatter dance (cameras.py:614-651).
"""
from __future__ import annotations

import enum
from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from sdfstudio_tpu.cameras import camera_utils
from sdfstudio_tpu.core.rays import RayBundle


class CameraType(enum.IntEnum):
    """Supported camera models (reference cameras.py:36-42)."""

    PERSPECTIVE = 1
    FISHEYE = 2
    EQUIRECTANGULAR = 3


# COLMAP / OpenCV model names (reference cameras.py:44-52)
CAMERA_MODEL_TO_TYPE = {
    "SIMPLE_PINHOLE": CameraType.PERSPECTIVE,
    "PINHOLE": CameraType.PERSPECTIVE,
    "SIMPLE_RADIAL": CameraType.PERSPECTIVE,
    "RADIAL": CameraType.PERSPECTIVE,
    "OPENCV": CameraType.PERSPECTIVE,
    "OPENCV_FISHEYE": CameraType.FISHEYE,
    "EQUIRECTANGULAR": CameraType.EQUIRECTANGULAR,
}


@struct.dataclass
class Cameras:
    """Batched camera intrinsics/extrinsics; leading shape [N]."""

    camera_to_worlds: jnp.ndarray  # [N, 3, 4]
    fx: jnp.ndarray  # [N]
    fy: jnp.ndarray  # [N]
    cx: jnp.ndarray  # [N]
    cy: jnp.ndarray  # [N]
    width: jnp.ndarray  # [N] int32
    height: jnp.ndarray  # [N] int32
    distortion_params: Optional[jnp.ndarray] = None  # [N, 6]
    camera_type: Optional[jnp.ndarray] = None  # [N] int32
    times: Optional[jnp.ndarray] = None  # [N]

    @classmethod
    def create(
        cls,
        camera_to_worlds,
        fx,
        fy,
        cx,
        cy,
        width,
        height,
        distortion_params=None,
        camera_type=CameraType.PERSPECTIVE,
        times=None,
    ) -> "Cameras":
        """Build from broadcastable host values."""
        c2w = jnp.asarray(camera_to_worlds, jnp.float32)
        n = c2w.shape[0]

        def vec(v, dtype=jnp.float32):
            arr = jnp.asarray(v, dtype)
            return jnp.broadcast_to(arr.reshape(-1), (n,)) if arr.ndim <= 1 else arr[..., 0]

        if isinstance(camera_type, (int, CameraType)):
            ctype = jnp.full((n,), int(camera_type), jnp.int32)
        else:
            ctype = jnp.asarray(camera_type, jnp.int32).reshape(n)
        return cls(
            camera_to_worlds=c2w,
            fx=vec(fx),
            fy=vec(fy),
            cx=vec(cx),
            cy=vec(cy),
            width=vec(width, jnp.int32),
            height=vec(height, jnp.int32),
            distortion_params=None
            if distortion_params is None
            else jnp.asarray(distortion_params, jnp.float32),
            camera_type=ctype,
            times=None if times is None else jnp.asarray(times, jnp.float32).reshape(n),
        )

    @property
    def num_cameras(self) -> int:
        return self.camera_to_worlds.shape[0]

    @property
    def image_height(self):
        return self.height

    @property
    def image_width(self):
        return self.width

    def get_intrinsics_matrices(self) -> jnp.ndarray:
        """[N, 3, 3] intrinsics (reference cameras.py:253-268)."""
        n = self.num_cameras
        K = jnp.zeros((n, 3, 3))
        K = K.at[:, 0, 0].set(self.fx)
        K = K.at[:, 1, 1].set(self.fy)
        K = K.at[:, 0, 2].set(self.cx)
        K = K.at[:, 1, 2].set(self.cy)
        K = K.at[:, 2, 2].set(1.0)
        return K

    def rescale_output_resolution(self, scaling_factor: float) -> "Cameras":
        """Scale intrinsics (reference cameras.py:737-771)."""
        return self.replace(
            fx=self.fx * scaling_factor,
            fy=self.fy * scaling_factor,
            cx=self.cx * scaling_factor,
            cy=self.cy * scaling_factor,
            width=(self.width.astype(jnp.float32) * scaling_factor).astype(jnp.int32),
            height=(self.height.astype(jnp.float32) * scaling_factor).astype(jnp.int32),
        )

    # ------------------------------------------------------------------
    def generate_rays(
        self,
        camera_indices: jnp.ndarray,  # [R] int32
        coords: jnp.ndarray,  # [R, 2] (y, x) pixel coords
        camera_opt_to_camera: Optional[jnp.ndarray] = None,  # [R, 3, 4]
        disable_distortion: bool = False,
    ) -> RayBundle:
        """Pixel coords -> world rays (reference cameras.py:459-696).

        coords convention matches the reference: coords[..., 0]=y (row),
        coords[..., 1]=x (col); pixel centers at +0.5 offsets are the
        caller's responsibility (the reference's image_coords adds 0.5,
        cameras.py:282-296).
        """
        idx = camera_indices
        y = coords[..., 0]
        x = coords[..., 1]
        fx, fy = self.fx[idx], self.fy[idx]
        cx, cy = self.cx[idx], self.cy[idx]

        # base + one-pixel offsets for pixel-area estimation
        coord = jnp.stack([(x - cx) / fx, -(y - cy) / fy], -1)
        coord_x = jnp.stack([(x - cx + 1) / fx, -(y - cy) / fy], -1)
        coord_y = jnp.stack([(x - cx) / fx, -(y - cy + 1) / fy], -1)
        coord_stack = jnp.stack([coord, coord_x, coord_y], axis=0)  # [3, R, 2]

        ctype = (
            self.camera_type[idx]
            if self.camera_type is not None
            else jnp.full(x.shape, int(CameraType.PERSPECTIVE), jnp.int32)
        )

        if not disable_distortion and self.distortion_params is not None:
            dist = self.distortion_params[idx]  # [R, 6]
            undistorted = camera_utils.radial_and_tangential_undistort(
                coord_stack, dist[None]
            )
            not_equirect = (ctype != int(CameraType.EQUIRECTANGULAR))[None, :, None]
            coord_stack = jnp.where(not_equirect, undistorted, coord_stack)

        # --- directions in camera frame, all three camera models ---
        cs0, cs1 = coord_stack[..., 0], coord_stack[..., 1]
        # perspective (cameras.py:616-621)
        persp = jnp.stack([cs0, cs1, -jnp.ones_like(cs0)], axis=-1)
        # fisheye (cameras.py:623-634)
        theta_f = jnp.clip(jnp.sqrt(cs0**2 + cs1**2), 1e-9, jnp.pi)
        sin_ratio = jnp.sin(theta_f) / theta_f
        fisheye = jnp.stack(
            [cs0 * sin_ratio, cs1 * sin_ratio, -jnp.cos(theta_f)], axis=-1
        )
        # equirectangular (cameras.py:636-647)
        theta_e = -jnp.pi * cs0
        phi = jnp.pi * (0.5 - cs1)
        equirect = jnp.stack(
            [
                -jnp.sin(theta_e) * jnp.sin(phi),
                jnp.cos(phi),
                -jnp.cos(theta_e) * jnp.sin(phi),
            ],
            axis=-1,
        )
        ct = ctype[None, :, None]
        directions_stack = jnp.where(
            ct == int(CameraType.PERSPECTIVE),
            persp,
            jnp.where(ct == int(CameraType.FISHEYE), fisheye, equirect),
        )  # [3, R, 3]

        c2w = self.camera_to_worlds[idx]  # [R, 3, 4]
        if camera_opt_to_camera is not None:
            c2w = camera_utils.multiply_poses(c2w, camera_opt_to_camera)
        rotation = c2w[..., :3, :3]

        directions_stack = jnp.sum(
            directions_stack[..., None, :] * rotation[None], axis=-1
        )  # [3, R, 3]
        directions_norm = jnp.linalg.norm(directions_stack[0], axis=-1, keepdims=True)
        directions_stack = directions_stack / jnp.maximum(
            jnp.linalg.norm(directions_stack, axis=-1, keepdims=True), 1e-12
        )

        origins = c2w[..., :3, 3]
        directions = directions_stack[0]
        dx = jnp.sqrt(jnp.sum((directions - directions_stack[1]) ** 2, axis=-1))
        dy = jnp.sqrt(jnp.sum((directions - directions_stack[2]) ** 2, axis=-1))
        pixel_area = (dx * dy)[..., None]

        times = self.times[idx][..., None] if self.times is not None else None

        return RayBundle(
            origins=origins,
            directions=directions,
            pixel_area=pixel_area,
            camera_indices=idx,
            directions_norm=directions_norm,
            times=times,
        )

    def generate_image_rays(
        self,
        camera_index: int,
        camera_opt_to_camera: Optional[jnp.ndarray] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
    ) -> RayBundle:
        """Full-image ray bundle for one camera (reference
        Cameras.generate_rays with camera_indices=int + keep_shape).

        height/width must be static ints for jit; defaults to host values.
        """
        h = int(height if height is not None else np.asarray(self.height)[camera_index])
        w = int(width if width is not None else np.asarray(self.width)[camera_index])
        ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
        coords = jnp.stack([ys, xs], axis=-1).reshape(-1, 2).astype(jnp.float32) + 0.5
        idx = jnp.full((h * w,), camera_index, jnp.int32)
        opt = None
        if camera_opt_to_camera is not None:
            opt = jnp.broadcast_to(camera_opt_to_camera, (h * w, 3, 4))
        return self.generate_rays(idx, coords, camera_opt_to_camera=opt)


def to_host(cameras: Cameras) -> dict:
    """JSON-serializable summary (viewer / config dumps)."""
    return {
        "camera_to_worlds": np.asarray(cameras.camera_to_worlds).tolist(),
        "fx": np.asarray(cameras.fx).tolist(),
        "fy": np.asarray(cameras.fy).tolist(),
        "cx": np.asarray(cameras.cx).tolist(),
        "cy": np.asarray(cameras.cy).tolist(),
        "width": np.asarray(cameras.width).tolist(),
        "height": np.asarray(cameras.height).tolist(),
    }
