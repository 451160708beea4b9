"""Instant-NGP model: occupancy-grid accelerated NeRF.

Functional spec: reference nerfstudio/models/instant_ngp.py:60-267
(OccupancyGrid + VolumetricSampler packed rendering). TPU adaptation:
fixed-step masked marching (samplers/grid.py) instead of nerfacc packed
samples; the grid is mutable model_state updated every N steps by a jitted
EMA step (the reference's OccupancyGrid.every_n_step callback,
instant_ngp.py:113-127).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sdfstudio_tpu.components.colliders import aabb_box_collider, near_far_collider
from sdfstudio_tpu.core.rays import RayBundle
from sdfstudio_tpu.fields.nerfacto_field import NerfactoField
from sdfstudio_tpu.models.base_model import Model, ModelConfig
from sdfstudio_tpu.ops import render as R
from sdfstudio_tpu.samplers.grid import (
    OccupancyGrid,
    occupancy_grid_sampler,
    update_occupancy_grid,
)


@dataclasses.dataclass(frozen=True)
class InstantNGPModelConfig(ModelConfig):
    enable_collider: bool = False
    grid_resolution: int = 128
    max_num_samples_per_ray: int = 256
    cone_angle: float = 0.0
    render_step_size: float = 0.01
    near_plane: float = 0.05
    far_plane: float = 1000.0
    alpha_thre: float = 1e-2
    background_color: str = "random"
    randomize_background: bool = True
    eval_num_rays_per_chunk: int = 8192
    contraction_type: str = "aabb"  # aabb | inf


class NGPModel(Model):
    config: InstantNGPModelConfig
    has_model_state = True
    model_state_update_every = 16

    def __init__(self, config, scene_box, num_train_data):
        super().__init__(config, scene_box, num_train_data)
        self.field = NerfactoField(
            aabb=jnp.asarray(scene_box.aabb),
            spatial_distortion=None if config.contraction_type == "aabb" else "inf",
            num_images=num_train_data,
            use_appearance_embedding=False,
        )

    def init(self, rng: jax.Array) -> Dict[str, Any]:
        return {"field": self.field.init(rng)}

    def init_model_state(self) -> OccupancyGrid:
        return OccupancyGrid.create(
            self.scene_box.aabb, resolution=self.config.grid_resolution
        )

    def update_model_state(self, params, model_state: OccupancyGrid, step, rng):
        """Jitted grid EMA update (reference instant_ngp.py:113-127)."""
        return update_occupancy_grid(
            model_state,
            self.field.density_fn(params["field"]),
            rng,
            occ_threshold=self.config.alpha_thre,
            render_step_size=self.config.render_step_size,
        )

    def apply_collider(self, ray_bundle: RayBundle, train: bool = True) -> RayBundle:
        return aabb_box_collider(
            ray_bundle,
            jnp.asarray(self.scene_box.aabb),
            near_plane=self.config.near_plane,
            training=train,
        )

    def get_outputs(
        self, params, ray_bundle: RayBundle, rng=None, sched=None, train=True,
        model_state: Optional[OccupancyGrid] = None,
    ) -> Dict:
        cfg = self.config
        ray_bundle = self.apply_collider(ray_bundle, train)
        grid = model_state if model_state is not None else self.init_model_state()

        rngs = list(jax.random.split(rng, 2)) if rng is not None else [None, None]
        ray_samples, valid = occupancy_grid_sampler(
            ray_bundle,
            grid,
            num_samples=cfg.max_num_samples_per_ray,
            rng=rngs[0],
            render_step_size=cfg.render_step_size,
        )
        field_outputs = self.field.get_outputs(params["field"], ray_samples, train=train)
        density = field_outputs["density"] * valid
        weights = R.weights_from_densities(ray_samples.deltas, density)

        if cfg.background_color == "random" and train and rngs[1] is not None:
            bg = jax.random.uniform(rngs[1], (*weights.shape[:-1], 3))
            rgb = R.render_rgb(field_outputs["rgb"], weights, background_rgb=bg)
        else:
            bgc = cfg.background_color if cfg.background_color != "random" else "black"
            rgb = R.render_rgb(field_outputs["rgb"], weights, background_color=bgc)
        depth = R.render_depth_expected(weights, ray_samples.starts, ray_samples.ends)
        accumulation = R.render_accumulation(weights)

        return {
            "rgb": rgb,
            "accumulation": accumulation,
            "depth": depth,
            "num_samples_per_ray": jnp.sum(valid, axis=-1),
        }

    def get_loss_dict(self, params, outputs, batch, sched, rng=None) -> Dict:
        return {"rgb_loss": jnp.mean((batch["image"] - outputs["rgb"]) ** 2)}

    def get_metrics_dict(self, params, outputs, batch) -> Dict:
        m = super().get_metrics_dict(params, outputs, batch)
        m["num_samples_per_batch"] = jnp.sum(outputs["num_samples_per_ray"])
        return m
