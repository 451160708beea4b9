"""Camera math utilities.

Functional spec: reference nerfstudio/cameras/camera_utils.py:1-465
(quaternions/slerp, viewmatrix, distortion params, iterative undistortion,
rotation between vectors, auto-orientation of poses) and
nerfstudio/utils/poses.py (pose composition). Device-side pieces (undistort)
are jnp; dataparser-side pieces (auto-orient) are numpy.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Pose helpers (reference nerfstudio/utils/poses.py)
# ---------------------------------------------------------------------------


def multiply_poses(a, b):
    """Compose two [..., 3, 4] poses: result = a @ [b; 0 0 0 1]."""
    xp = jnp if isinstance(a, jnp.ndarray) else np
    R = a[..., :3, :3] @ b[..., :3, :3]
    t = a[..., :3, 3:] + a[..., :3, :3] @ b[..., :3, 3:]
    return xp.concatenate([R, t], axis=-1)


def inverse_pose(pose):
    """Invert [..., 3, 4] rigid pose."""
    xp = jnp if isinstance(pose, jnp.ndarray) else np
    R = xp.swapaxes(pose[..., :3, :3], -1, -2)
    t = -R @ pose[..., :3, 3:]
    return xp.concatenate([R, t], axis=-1)


def to4x4(pose: np.ndarray) -> np.ndarray:
    """[..., 3, 4] -> [..., 4, 4]."""
    bottom = np.broadcast_to(
        np.array([0, 0, 0, 1.0], dtype=pose.dtype), (*pose.shape[:-2], 1, 4)
    )
    return np.concatenate([pose, bottom], axis=-2)


# ---------------------------------------------------------------------------
# Quaternions (reference camera_utils.py:29-171)
# ---------------------------------------------------------------------------


def unit_vector(data: np.ndarray) -> np.ndarray:
    return data / np.linalg.norm(data)


def quaternion_from_matrix(matrix: np.ndarray) -> np.ndarray:
    """Rotation matrix [3,3] (or [4,4]) -> quaternion [w, x, y, z]."""
    M = np.asarray(matrix, dtype=np.float64)[:3, :3]
    q = np.empty(4)
    t = np.trace(M)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        q[0] = 0.25 * s
        q[1] = (M[2, 1] - M[1, 2]) / s
        q[2] = (M[0, 2] - M[2, 0]) / s
        q[3] = (M[1, 0] - M[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(M)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(M[i, i] - M[j, j] - M[k, k] + 1.0) * 2
        qv = np.empty(3)
        qv[i] = 0.25 * s
        qv[j] = (M[j, i] + M[i, j]) / s
        qv[k] = (M[k, i] + M[i, k]) / s
        q[0] = (M[k, j] - M[j, k]) / s
        q[1:] = qv
    return q


def quaternion_slerp(quat0: np.ndarray, quat1: np.ndarray, fraction: float, spin: int = 0, shortestpath: bool = True) -> np.ndarray:
    """Spherical linear interpolation between two quaternions
    (reference camera_utils.py:55-101)."""
    EPS = np.finfo(float).eps * 4.0
    q0 = unit_vector(np.asarray(quat0, dtype=np.float64))
    q1 = unit_vector(np.asarray(quat1, dtype=np.float64))
    if fraction == 0.0:
        return q0
    if fraction == 1.0:
        return q1
    d = np.dot(q0, q1)
    if abs(abs(d) - 1.0) < EPS:
        return q0
    if shortestpath and d < 0.0:
        d = -d
        q1 = -q1
    angle = np.arccos(np.clip(d, -1, 1)) + spin * np.pi
    if abs(angle) < EPS:
        return q0
    isin = 1.0 / np.sin(angle)
    q0 = q0 * np.sin((1.0 - fraction) * angle) * isin
    q1 = q1 * np.sin(fraction * angle) * isin
    return q0 + q1


def quaternion_matrix(quaternion: np.ndarray) -> np.ndarray:
    """Quaternion [w,x,y,z] -> 4x4 rotation matrix."""
    q = np.asarray(quaternion, dtype=np.float64)
    n = np.dot(q, q)
    if n < np.finfo(float).eps * 4.0:
        return np.eye(4)
    q = q * np.sqrt(2.0 / n)
    q = np.outer(q, q)
    return np.array(
        [
            [1.0 - q[2, 2] - q[3, 3], q[1, 2] - q[3, 0], q[1, 3] + q[2, 0], 0.0],
            [q[1, 2] + q[3, 0], 1.0 - q[1, 1] - q[3, 3], q[2, 3] - q[1, 0], 0.0],
            [q[1, 3] - q[2, 0], q[2, 3] + q[1, 0], 1.0 - q[1, 1] - q[2, 2], 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )


def get_interpolated_poses(pose_a: np.ndarray, pose_b: np.ndarray, steps: int = 10):
    """Interpolate between two [3 or 4, 4] poses: slerp rotation + lerp
    translation (reference camera_utils.py:174-198)."""
    quat_a = quaternion_from_matrix(pose_a[:3, :3])
    quat_b = quaternion_from_matrix(pose_b[:3, :3])
    ts = np.linspace(0, 1, steps)
    poses = []
    for t in ts:
        quat = quaternion_slerp(quat_a, quat_b, float(t))
        R = quaternion_matrix(quat)[:3, :3]
        trans = pose_a[:3, 3] * (1 - t) + pose_b[:3, 3] * t
        poses.append(np.concatenate([R, trans[:, None]], axis=1))
    return np.stack(poses)


def viewmatrix(lookat: np.ndarray, up: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Camera-to-world from lookat/up/pos (reference camera_utils.py:233-249)."""
    vec2 = unit_vector(lookat)
    vec1_avg = unit_vector(up)
    vec0 = unit_vector(np.cross(vec1_avg, vec2))
    vec1 = unit_vector(np.cross(vec2, vec0))
    return np.stack([vec0, vec1, vec2, pos], axis=1)


def get_distortion_params(k1=0.0, k2=0.0, k3=0.0, k4=0.0, p1=0.0, p2=0.0) -> np.ndarray:
    """[k1, k2, k3, k4, p1, p2] (reference camera_utils.py:252-273)."""
    return np.array([k1, k2, k3, k4, p1, p2], dtype=np.float32)


# ---------------------------------------------------------------------------
# OpenCV radial/tangential undistortion via Newton iteration — device side
# (reference camera_utils.py:275-384). Fixed 10 iterations -> one fused
# unrolled jit program.
# ---------------------------------------------------------------------------


def _residual_and_jacobian(x, y, xd, yd, params):
    k1, k2, k3, k4 = params[..., 0], params[..., 1], params[..., 2], params[..., 3]
    p1, p2 = params[..., 4], params[..., 5]
    r = x * x + y * y
    d = 1.0 + r * (k1 + r * (k2 + r * (k3 + r * k4)))
    fx = d * x + 2 * p1 * x * y + p2 * (r + 2 * x * x) - xd
    fy = d * y + 2 * p2 * x * y + p1 * (r + 2 * y * y) - yd
    d_r = k1 + r * (2.0 * k2 + r * (3.0 * k3 + r * 4.0 * k4))
    d_x = 2.0 * x * d_r
    d_y = 2.0 * y * d_r
    fx_x = d + d_x * x + 2.0 * p1 * y + 6.0 * p2 * x
    fx_y = d_y * x + 2.0 * p1 * x + 2.0 * p2 * y
    fy_x = d_x * y + 2.0 * p2 * y + 2.0 * p1 * x
    fy_y = d + d_y * y + 2.0 * p2 * x + 6.0 * p1 * y
    return fx, fy, fx_x, fx_y, fy_x, fy_y


def radial_and_tangential_undistort(
    coords: jnp.ndarray,  # [..., 2]
    distortion_params: jnp.ndarray,  # [..., 6]
    eps: float = 1e-3,
    max_iterations: int = 10,
) -> jnp.ndarray:
    """Invert the OpenCV distortion model by Newton's method."""
    xd, yd = coords[..., 0], coords[..., 1]
    x, y = xd, yd
    for _ in range(max_iterations):
        fx, fy, fx_x, fx_y, fy_x, fy_y = _residual_and_jacobian(x, y, xd, yd, distortion_params)
        denom = fy_x * fx_y - fx_x * fy_y
        x_num = fx * fy_y - fy * fx_y
        y_num = fy * fx_x - fx * fy_x
        safe = jnp.abs(denom) > eps
        x = x + jnp.where(safe, x_num / denom, 0.0)
        y = y + jnp.where(safe, y_num / denom, 0.0)
    return jnp.stack([x, y], axis=-1)


# ---------------------------------------------------------------------------
# Pose orientation / centering — host side (reference camera_utils.py:387-465)
# ---------------------------------------------------------------------------


def rotation_matrix_between(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Rotation taking unit vector a to unit vector b (Rodrigues form)."""
    a = a / np.linalg.norm(a)
    b = b / np.linalg.norm(b)
    v = np.cross(a, b)
    c = float(np.dot(a, b))
    if c < -1 + 1e-8:
        eps = (np.random.rand(3) - 0.5) * 0.01
        return rotation_matrix_between(a + eps, b)
    s = np.linalg.norm(v)
    skew = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + skew + skew @ skew * ((1 - c) / (s**2 + 1e-8))


def auto_orient_and_center_poses(
    poses: np.ndarray, method: str = "up", center_poses: bool = True
) -> Tuple[np.ndarray, np.ndarray]:
    """Orient (pca/up/none) and center camera poses
    (reference camera_utils.py:387-465). poses: [N, 4, 4].
    Returns (oriented [N, 3, 4], transform [3, 4])."""
    poses = np.asarray(poses, dtype=np.float64)
    translation = poses[..., :3, 3]
    mean_translation = translation.mean(axis=0)
    translation_diff = translation - mean_translation
    translation = mean_translation if center_poses else np.zeros(3)

    if method == "pca":
        _, eigvec = np.linalg.eigh(translation_diff.T @ translation_diff)
        eigvec = np.flip(eigvec, axis=-1).copy()
        if np.linalg.det(eigvec) < 0:
            eigvec[:, 2] = -eigvec[:, 2]
        transform = np.concatenate([eigvec, eigvec @ -translation[:, None]], axis=-1)
        oriented = transform @ poses
        if oriented.mean(axis=0)[2, 1] < 0:
            oriented[:, 1:3] = -oriented[:, 1:3]
    elif method == "up":
        up = poses[:, :3, 1].mean(axis=0)
        up = up / np.linalg.norm(up)
        rotation = rotation_matrix_between(up, np.array([0, 0, 1.0]))
        transform = np.concatenate([rotation, rotation @ -translation[:, None]], axis=-1)
        oriented = transform @ poses
    elif method == "none":
        transform = np.eye(4)
        transform[:3, 3] = -translation
        transform = transform[:3, :]
        oriented = transform @ poses
    else:
        raise ValueError(f"unknown orientation method {method}")
    return oriented.astype(np.float32), transform.astype(np.float32)
