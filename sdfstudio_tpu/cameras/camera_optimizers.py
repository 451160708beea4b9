"""Learnable per-camera pose refinement.

Functional spec: reference nerfstudio/cameras/camera_optimizers.py:38-130.
A linen module holding a [num_cameras, 6] tangent table; modes off / SO3xR3 /
SE3. Optional injected noise reproduces the reference's robustness-debug
pose perturbation (camera_optimizers.py:47-51, 90-97).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sdfstudio_tpu.cameras.lie_groups import exp_map_SE3, exp_map_SO3xR3


@dataclasses.dataclass(frozen=True)
class CameraOptimizerConfig:
    mode: str = "off"  # off | SO3xR3 | SE3
    position_noise_std: float = 0.0
    orientation_noise_std: float = 0.0


class CameraOptimizer(nn.Module):
    """Pose-delta table -> [R, 3, 4] correction matrices."""

    num_cameras: int
    config: CameraOptimizerConfig = CameraOptimizerConfig()

    @nn.compact
    def __call__(self, indices: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        R = indices.shape[0]
        eye = jnp.broadcast_to(
            jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=-1), (R, 3, 4)
        )
        if cfg.mode == "off":
            return eye
        adjustment = self.param(
            "pose_adjustment", nn.initializers.zeros, (self.num_cameras, 6)
        )
        tangent = adjustment[indices]
        if cfg.mode == "SO3xR3":
            out = exp_map_SO3xR3(tangent)
        elif cfg.mode == "SE3":
            out = exp_map_SE3(tangent)
        else:
            raise ValueError(f"unknown camera optimizer mode {cfg.mode}")

        if cfg.position_noise_std > 0 or cfg.orientation_noise_std > 0:
            noise = self.variable(
                "constants",
                "pose_noise",
                lambda: _pose_noise(
                    jax.random.PRNGKey(0),
                    self.num_cameras,
                    cfg.position_noise_std,
                    cfg.orientation_noise_std,
                ),
            ).value
            from sdfstudio_tpu.cameras.camera_utils import multiply_poses

            out = multiply_poses(noise[indices], out)
        return out


def _pose_noise(key, num_cameras, pos_std, orient_std):
    std = jnp.asarray([pos_std] * 3 + [orient_std] * 3)
    tangent = jax.random.normal(key, (num_cameras, 6)) * std
    return exp_map_SE3(tangent)
