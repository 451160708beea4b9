"""NeuralReconW (neusW) model.

Functional spec: reference nerfstudio/models/neuralreconW.py:40-77 +
NeuralReconWSampler (ray_samplers.py:1141-1312): NeuS rendering with
voxel + surface-cache guided sampling —

- COARSE grid: the colmap-derived binary occupancy from the heritage
  dataparser (scene_box.coarse_binary_gird) tightens per-ray [near, far]
  and supplies 10 uniform "boundary" samples;
- FINE grid (model_state): refreshed every ``steps_per_grid_update`` from
  ``sdf <= 0`` at voxel centers inside occupied coarse cells
  (ray_samplers.py:1211-1247); once armed, NeuS sampling collapses to a
  +-0.03 shell around the first fine hit (ray_samplers.py:1297-1301);
- NeuS importance sampling (8 base + 16 importance, 2 rounds, base
  variance 512) euclidean-merged with the voxel samples.

SphereCollider override as in the reference (neuralreconW.py:59). The
shared sampling flow lives in samplers/surface_guided.py (the reference
DtoO model inlines the same logic).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from sdfstudio_tpu.components.colliders import sphere_collider
from sdfstudio_tpu.core.rays import RayBundle
from sdfstudio_tpu.models.neus import NeuSModel, NeuSModelConfig
from sdfstudio_tpu.ops import render as R
from sdfstudio_tpu.samplers.grid import OccupancyGrid
from sdfstudio_tpu.samplers.surface_guided import voxel_surface_guided_samples


@dataclasses.dataclass(frozen=True)
class NeuralReconWModelConfig(NeuSModelConfig):
    # NeuralReconWSampler defaults (ray_samplers.py:1144-1156)
    num_samples: int = 8
    num_samples_importance: int = 16
    num_up_sample_steps: int = 2
    base_variance: float = 512.0
    num_voxel_samples: int = 10  # num_samples_boundary
    coarse_probe_steps: int = 64
    fine_shell_margin: float = 0.03
    grid_resolution: int = 256  # reference fine_resolution=512
    fine_grid_update_every: int = 5000  # steps_per_grid_update
    fine_grid_warmup: int = 5000
    background_model: str = "grid"
    num_samples_outside: int = 4
    eikonal_loss_mult: float = 1e-4


class NeuralReconWModel(NeuSModel):
    config: NeuralReconWModelConfig
    has_model_state = True

    @property
    def model_state_update_every(self):
        return self.config.fine_grid_update_every

    # -- grids ----------------------------------------------------------
    def _coarse_np(self) -> np.ndarray:
        coarse = self.scene_box.coarse_binary_grid
        if coarse is None:
            return np.ones((32, 32, 32), bool)
        coarse = np.asarray(coarse, bool)
        cres = round(coarse.size ** (1 / 3))
        return coarse.reshape(cres, cres, cres)

    def _coarse_grid(self) -> OccupancyGrid:
        binary = self._coarse_np()
        aabb = np.asarray(self.scene_box.aabb, np.float32)
        grid = OccupancyGrid.create(aabb, resolution=binary.shape[0])
        return grid.replace(binary=jnp.asarray(binary))

    def _coarse_mask_at(self, res: int) -> np.ndarray:
        coarse = self._coarse_np()
        rep = res // coarse.shape[0]
        return np.repeat(np.repeat(np.repeat(coarse, rep, 0), rep, 1), rep, 2)

    def init_model_state(self) -> OccupancyGrid:
        """Fine grid starts DISARMED — the reference bootstraps with
        ``_binary_fine=None`` until the first refresh (ray_samplers.py:1192)."""
        res = self.config.grid_resolution
        grid = OccupancyGrid.create(
            np.asarray(self.scene_box.aabb, np.float32), resolution=res
        )
        return grid.replace(binary=jnp.zeros((res,) * 3, bool))

    def update_model_state(self, params, model_state: OccupancyGrid, step, rng):
        """Refresh the fine surface cache from sdf <= 0 at voxel centers
        within occupied coarse cells (reference ray_samplers.py:1211-1247)."""
        import jax

        res = model_state.resolution
        positions = model_state.cell_positions(rng=None)
        sdf_fn = self.field.sdf_fn(params["field"])
        chunk = 1 << 16
        n = positions.shape[0]
        pad = (-n) % chunk
        padded = jnp.pad(positions, ((0, pad), (0, 0)))
        sdf = jax.lax.map(sdf_fn, padded.reshape(-1, chunk, 3)).reshape(-1)[:n]
        inside = (sdf <= 0.0).reshape(res, res, res)
        coarse = jnp.asarray(self._coarse_mask_at(res))
        armed = step >= self.config.fine_grid_warmup
        return model_state.replace(binary=inside & coarse & armed)

    # -- forward --------------------------------------------------------
    def apply_collider(self, ray_bundle: RayBundle, train: bool = True) -> RayBundle:
        # SphereCollider override (reference neuralreconW.py:59)
        return sphere_collider(
            ray_bundle, radius=self.scene_box.radius or 1.0, soft_intersection=True
        )

    def sample_and_forward_field(
        self, params, ray_bundle: RayBundle, rng, sched, train,
        model_state: Optional[OccupancyGrid] = None,
    ) -> Dict:
        cfg = self.config
        fine = model_state if model_state is not None else self.init_model_state()
        sdf_fn_raw = self.field.sdf_fn(params["field"], sched.get("hash_mask"))

        def sdf_fn(samples):
            return sdf_fn_raw(samples.get_start_positions().reshape(-1, 3)).reshape(
                samples.starts.shape
            )

        ray_samples = voxel_surface_guided_samples(
            ray_bundle,
            self._coarse_grid(),
            fine,
            sdf_fn,
            rng=rng if (train and cfg.perturb) else None,
            num_voxel_samples=cfg.num_voxel_samples,
            num_samples=cfg.num_samples,
            num_samples_importance=cfg.num_samples_importance,
            num_upsample_steps=cfg.num_up_sample_steps,
            base_variance=cfg.base_variance,
            coarse_probe_steps=cfg.coarse_probe_steps,
            fine_shell_margin=cfg.fine_shell_margin,
        )

        field_outputs = self.field.get_outputs(
            params["field"],
            ray_samples,
            hash_mask=sched.get("hash_mask"),
            cos_anneal_ratio=sched["cos_anneal_ratio"],
            numerical_delta=sched.get("numerical_delta"),
            return_alphas=True,
            train=train,
        )
        weights, transmittance = R.weights_and_transmittance_from_alphas(
            field_outputs["alpha"]
        )
        return {
            "ray_samples": ray_samples,
            "field_outputs": field_outputs,
            "weights": weights,
            "bg_transmittance": transmittance[:, -1:],
        }
