"""Scene bounds.

Functional spec: reference nerfstudio/data/scene_box.py:28-103. Host-side
dataclass (numpy); the aabb array is passed into jitted code as a constant.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np


@dataclass
class SceneBox:
    """Axis-aligned scene bounds + collider selection."""

    aabb: np.ndarray = field(
        default_factory=lambda: np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]], np.float32)
    )
    """[2, 3]: min and max corners."""
    coarse_binary_grid: Optional[np.ndarray] = None
    """Coarse occupancy grid from sparse SfM points (NeuralReconW / dto)."""
    near: Optional[float] = 0.1
    far: Optional[float] = 6.0
    radius: Optional[float] = 1.0
    collider_type: str = "box"  # box | near_far | sphere

    def get_diagonal_length(self) -> float:
        diff = self.aabb[1] - self.aabb[0]
        return float(np.sqrt((diff**2).sum() + 1e-20))

    def get_center(self) -> np.ndarray:
        return self.aabb[0] + (self.aabb[1] - self.aabb[0]) / 2.0

    def get_centered_and_scaled_scene_box(self, scale_factor: float = 1.0) -> "SceneBox":
        return SceneBox(aabb=(self.aabb - self.get_center()) * scale_factor)

    @staticmethod
    def get_normalized_positions(positions, aabb):
        """Normalize positions to [0, 1]^3 within the aabb
        (reference scene_box.py:67-77). Works on jnp or np arrays."""
        lengths = aabb[1] - aabb[0]
        return (positions - aabb[0]) / lengths

    def to_json(self) -> Dict:
        return {
            "type": "aabb",
            "min_point": self.aabb[0].tolist(),
            "max_point": self.aabb[1].tolist(),
        }

    @staticmethod
    def from_camera_poses(poses: np.ndarray, scale_factor: float) -> "SceneBox":
        xyzs = poses[..., :3, -1]
        aabb = np.stack([xyzs.min(axis=0), xyzs.max(axis=0)])
        return SceneBox(aabb=aabb * scale_factor)
