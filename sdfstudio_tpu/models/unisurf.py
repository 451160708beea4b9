"""UniSurf model.

Functional spec: reference nerfstudio/models/unisurf.py:37-136. The sampler
interval-decay callback becomes the pure delta schedule
(:func:`unisurf_interval_delta`).
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from sdfstudio_tpu.core.rays import RayBundle
from sdfstudio_tpu.models.base_surface_model import SurfaceModel, SurfaceModelConfig
from sdfstudio_tpu.ops import render as R
from sdfstudio_tpu.ops.density import unisurf_occupancy
from sdfstudio_tpu.samplers.unisurf import unisurf_interval_delta, unisurf_sampler


@dataclasses.dataclass(frozen=True)
class UniSurfModelConfig(SurfaceModelConfig):
    eikonal_loss_mult: float = 0.0  # eikonal not used in unisurf (unisurf.py:42)
    smooth_loss_multi: float = 0.005
    num_samples_interval: int = 64
    num_samples_importance: int = 32
    num_marching_steps: int = 256
    perturb: bool = True


class UniSurfModel(SurfaceModel):
    config: UniSurfModelConfig

    def __init__(self, config, scene_box, num_train_data):
        assert config.eikonal_loss_mult == 0.0
        super().__init__(config, scene_box, num_train_data)

    def schedules(self, step: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        sched = super().schedules(step)
        sched["unisurf_delta"] = unisurf_interval_delta(step)
        return sched

    def sample_and_forward_field(self, params, ray_bundle: RayBundle, rng, sched, train) -> Dict:
        """Reference unisurf.py:92-110."""
        sdf_fn_raw = self.field.sdf_fn(params["field"], sched.get("hash_mask"))

        def sdf_fn(samples):
            return sdf_fn_raw(samples.get_start_positions().reshape(-1, 3)).reshape(
                samples.starts.shape
            )

        ray_samples, surface = unisurf_sampler(
            ray_bundle,
            unisurf_occupancy,
            sdf_fn,
            delta=sched["unisurf_delta"],
            rng=rng if (train and self.config.perturb) else None,
            num_samples_interval=self.config.num_samples_interval,
            num_samples_outside=self.config.num_samples_outside,
            num_samples_importance=self.config.num_samples_importance,
            num_marching_steps=self.config.num_marching_steps,
        )
        field_outputs = self.field.get_outputs(
            params["field"],
            ray_samples,
            hash_mask=sched.get("hash_mask"),
            numerical_delta=sched.get("numerical_delta"),
            return_occupancy=True,
            train=train,
        )
        weights, transmittance = R.weights_and_transmittance_from_alphas(
            field_outputs["occupancy"]
        )
        return {
            "ray_samples": ray_samples,
            "surface_points": surface.points,
            "surface_points_mask": surface.mask,
            "field_outputs": field_outputs,
            "weights": weights,
            "bg_transmittance": transmittance[:, -1:],
        }

    def get_loss_dict(self, params, outputs, batch, sched, rng=None) -> Dict:
        loss_dict = super().get_loss_dict(params, outputs, batch, sched, rng)
        # eikonal term is excluded for unisurf (mult = 0)
        loss_dict.pop("eikonal_loss", None)

        if self.config.smooth_loss_multi > 0.0 and "surface_points" in outputs:
            # surface normal smoothness (reference unisurf.py:119-136); invalid
            # rays are masked instead of compacted
            pts = outputs["surface_points"]
            mask = outputs["surface_points_mask"].astype(jnp.float32)
            noise_rng = rng if rng is not None else jax.random.PRNGKey(0)
            neig = pts + (jax.random.uniform(noise_rng, pts.shape) - 0.5) * 0.01
            pp = jnp.concatenate([pts, neig], axis=0)
            grad = self.field.gradient(params["field"], pp, hash_mask=sched.get("hash_mask"))
            normals = grad / jnp.sqrt(jnp.sum(grad**2, axis=-1, keepdims=True) + 1e-12)
            N = pts.shape[0]
            # eps inside the sqrt: ||n1 - n2|| has a NaN gradient at 0 (fused
            # under jit), and near-identical normals do occur
            diff_norm = jnp.sqrt(jnp.sum((normals[:N] - normals[N:]) ** 2, axis=-1) + 1e-12)
            loss_dict["normal_smoothness_loss"] = (
                jnp.sum(diff_norm * mask) / jnp.maximum(jnp.sum(mask), 1.0)
            ) * self.config.smooth_loss_multi
        return loss_dict

    def get_metrics_dict(self, params, outputs, batch) -> Dict:
        return super().get_metrics_dict(params, outputs, batch)
