"""NeuralReconW (neusW) model.

Functional spec: reference nerfstudio/models/neuralreconW.py:40-77 +
NeuralReconWSampler (ray_samplers.py:1141-1312): NeuS rendering with
sampling restricted by (a) the coarse colmap-derived binary grid from the
heritage dataparser (scene_box.coarse_binary_gird) and (b) a fine SDF-cache
binary grid refreshed every N steps. TPU adaptation: both grids live in a
dense OccupancyGrid model_state; sampling is fixed-step masked marching
(samplers/grid.py) with the fine mask ANDed into the coarse mask.
SphereCollider override as in the reference (neuralreconW.py:59).
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from sdfstudio_tpu.components.colliders import sphere_collider
from sdfstudio_tpu.core.rays import RayBundle
from sdfstudio_tpu.models.neus_acc import NeuSAccModel, NeuSAccModelConfig
from sdfstudio_tpu.samplers.grid import OccupancyGrid


@dataclasses.dataclass(frozen=True)
class NeuralReconWModelConfig(NeuSAccModelConfig):
    grid_resolution: int = 128
    fine_grid_update_every: int = 5000
    sdf_surface_threshold: float = 0.05
    background_model: str = "grid"
    num_samples_outside: int = 4
    eikonal_loss_mult: float = 1e-4


class NeuralReconWModel(NeuSAccModel):
    config: NeuralReconWModelConfig

    @property
    def model_state_update_every(self):
        return self.config.fine_grid_update_every

    def _coarse_mask(self) -> np.ndarray:
        """Upsample the colmap coarse grid to the sampling resolution."""
        res = self.config.grid_resolution
        coarse = self.scene_box.coarse_binary_grid
        if coarse is None:
            return np.ones((res,) * 3, bool)
        coarse = np.asarray(coarse, bool)
        rep = res // coarse.shape[0]
        return np.repeat(np.repeat(np.repeat(coarse, rep, 0), rep, 1), rep, 2)

    def init_model_state(self) -> OccupancyGrid:
        grid = OccupancyGrid.create(self.scene_box.aabb, resolution=self.config.grid_resolution)
        return grid.replace(binary=jnp.asarray(self._coarse_mask()))

    def update_model_state(self, params, model_state: OccupancyGrid, step, rng):
        """Refresh the fine SDF-cache grid: occupied where |sdf| < threshold,
        within the coarse colmap mask (reference ray_samplers.py:1211-1247)."""
        positions = model_state.cell_positions(rng)
        sdf = self.field.sdf_fn(params["field"])(positions)
        res = model_state.resolution
        fine = (jnp.abs(sdf) < self.config.sdf_surface_threshold).reshape(res, res, res)
        coarse = jnp.asarray(self._coarse_mask())
        return model_state.replace(occs=jnp.abs(sdf), binary=fine & coarse)

    def apply_collider(self, ray_bundle: RayBundle, train: bool = True) -> RayBundle:
        # SphereCollider override (reference neuralreconW.py:59)
        return sphere_collider(
            ray_bundle, radius=self.scene_box.radius or 1.0, soft_intersection=True
        )
