"""VolSDF model.

Functional spec: reference nerfstudio/models/volsdf.py:31-103.
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax.numpy as jnp

from sdfstudio_tpu.core.rays import RayBundle
from sdfstudio_tpu.models.base_surface_model import SurfaceModel, SurfaceModelConfig
from sdfstudio_tpu.ops import render as R
from sdfstudio_tpu.ops.density import laplace_density
from sdfstudio_tpu.samplers.error_bounded import error_bounded_sampler


@dataclasses.dataclass(frozen=True)
class VolSDFModelConfig(SurfaceModelConfig):
    num_samples: int = 64
    num_samples_eval: int = 128
    num_samples_extra: int = 32
    max_total_iters: int = 5


class VolSDFModel(SurfaceModel):
    config: VolSDFModelConfig

    def sample_and_forward_field(self, params, ray_bundle: RayBundle, rng, sched, train) -> Dict:
        """Reference volsdf.py:63-79."""
        sdf_fn_raw = self.field.sdf_fn(params["field"], sched.get("hash_mask"))

        def sdf_fn(samples):
            return sdf_fn_raw(samples.get_start_positions().reshape(-1, 3)).reshape(
                samples.starts.shape
            )

        beta0 = self.field.get_beta(params["field"])[0]

        ray_samples, eik_points = error_bounded_sampler(
            ray_bundle,
            laplace_density,
            sdf_fn,
            beta0=beta0,
            rng=rng if train else None,
            num_samples=self.config.num_samples,
            num_samples_eval=self.config.num_samples_eval,
            num_samples_extra=self.config.num_samples_extra,
            max_total_iters=self.config.max_total_iters,
        )
        field_outputs = self.field.get_outputs(
            params["field"],
            ray_samples,
            hash_mask=sched.get("hash_mask"),
            numerical_delta=sched.get("numerical_delta"),
            train=train,
        )
        weights, transmittance = R.weights_and_transmittance_from_densities(
            ray_samples.deltas, field_outputs["density"]
        )
        return {
            "ray_samples": ray_samples,
            "eik_points": eik_points,
            "field_outputs": field_outputs,
            "weights": weights,
            "bg_transmittance": transmittance[:, -1:],
        }

    def get_metrics_dict(self, params, outputs, batch) -> Dict:
        m = super().get_metrics_dict(params, outputs, batch)
        beta = self.field.get_beta(params["field"])[0]
        m["beta"] = beta
        m["alpha"] = 1.0 / beta
        return m
