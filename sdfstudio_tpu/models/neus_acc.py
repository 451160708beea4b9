"""NeuS-acc: NeuS with occupancy-grid empty-space skipping.

Functional spec: reference nerfstudio/models/neus_acc.py:40-148 +
NeuSAccSampler (ray_samplers.py:1315-1503): a 128^3 binary grid pruned by
alpha(sdf, inv_s) with step size adapted to inv_s, packed nerfacc samples.
TPU adaptation: fixed-step masked marching (invalid samples contribute
alpha=0); the grid is jitted-updated model_state. Before the first grid
update the grid is fully occupied, which reproduces the reference's
bootstrap-with-dense-sampling phase (ray_samplers.py:1467).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from sdfstudio_tpu.core.rays import RayBundle
from sdfstudio_tpu.models.neus import NeuSModel, NeuSModelConfig
from sdfstudio_tpu.ops import render as R
from sdfstudio_tpu.samplers.grid import OccupancyGrid, occupancy_grid_sampler


@dataclasses.dataclass(frozen=True)
class NeuSAccModelConfig(NeuSModelConfig):
    grid_resolution: int = 128
    grid_update_every: int = 16
    num_samples_acc: int = 128
    alpha_sample_thre: float = 1e-3


class NeuSAccModel(NeuSModel):
    config: NeuSAccModelConfig
    has_model_state = True

    @property
    def model_state_update_every(self):
        return self.config.grid_update_every

    def init_model_state(self) -> OccupancyGrid:
        return OccupancyGrid.create(
            self.scene_box.aabb, resolution=self.config.grid_resolution
        )

    def update_model_state(self, params, model_state: OccupancyGrid, step, rng):
        """Prune cells by alpha(sdf, inv_s) (reference
        ray_samplers.py:1384-1433); step size adapts to inv_s
        (update_step_size, ray_samplers.py:1378)."""
        inv_s = self.field.get_inv_s(params["field"])[0]
        step_size = 14.0 / inv_s / 16.0
        positions = model_state.cell_positions(rng)
        sdf = self.field.sdf_fn(params["field"])(positions)
        # logistic-cdf interval opacity for a straight-on crossing
        prev_cdf = jax.nn.sigmoid((sdf + step_size * 0.5) * inv_s)
        next_cdf = jax.nn.sigmoid((sdf - step_size * 0.5) * inv_s)
        alpha = jnp.clip((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5), 0.0, 1.0)
        res = model_state.resolution
        binary = (alpha > self.config.alpha_sample_thre).reshape(res, res, res)
        return model_state.replace(occs=alpha, binary=binary)

    def sample_and_forward_field(
        self, params, ray_bundle: RayBundle, rng, sched, train,
        model_state: Optional[OccupancyGrid] = None,
    ) -> Dict:
        grid = model_state if model_state is not None else self.init_model_state()
        ray_samples, valid = occupancy_grid_sampler(
            ray_bundle, grid, num_samples=self.config.num_samples_acc,
            rng=rng if (train and self.config.perturb) else None,
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
        field_outputs = dict(field_outputs)
        field_outputs["alpha"] = field_outputs["alpha"] * valid
        weights, transmittance = R.weights_and_transmittance_from_alphas(
            field_outputs["alpha"]
        )
        return {
            "ray_samples": ray_samples,
            "field_outputs": field_outputs,
            "weights": weights,
            "bg_transmittance": transmittance[:, -1:],
            "valid_samples": valid,
            "num_samples_per_ray": jnp.sum(valid, axis=-1),
        }
