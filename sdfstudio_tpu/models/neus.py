"""NeuS model.

Functional spec: reference nerfstudio/models/neus.py:35-120. The cos-anneal
callback becomes the pure ``schedules`` function of step.
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from sdfstudio_tpu.core.rays import RayBundle
from sdfstudio_tpu.models.base_surface_model import SurfaceModel, SurfaceModelConfig
from sdfstudio_tpu.ops import render as R
from sdfstudio_tpu.samplers.neus import neus_sampler


@dataclasses.dataclass(frozen=True)
class NeuSModelConfig(SurfaceModelConfig):
    num_samples: int = 64
    num_samples_importance: int = 64
    num_up_sample_steps: int = 4
    base_variance: float = 64.0
    perturb: bool = True


class NeuSModel(SurfaceModel):
    config: NeuSModelConfig

    anneal_end: int = 50000  # reference neus.py:74

    def schedules(self, step: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        sched = super().schedules(step)
        if self.anneal_end > 0:
            sched["cos_anneal_ratio"] = jnp.minimum(1.0, step / self.anneal_end)
        return sched

    def sample_and_forward_field(self, params, ray_bundle: RayBundle, rng, sched, train) -> Dict:
        """Reference neus.py:97-113."""
        sdf_fn_raw = self.field.sdf_fn(params["field"], sched.get("hash_mask"))

        def sdf_fn(samples):
            return sdf_fn_raw(samples.get_start_positions().reshape(-1, 3)).reshape(
                samples.starts.shape
            )

        sampler_rng = rng if (train and self.config.perturb) else None
        ray_samples = neus_sampler(
            ray_bundle,
            sdf_fn,
            rng=sampler_rng,
            num_samples=self.config.num_samples,
            num_samples_importance=self.config.num_samples_importance,
            num_upsample_steps=self.config.num_up_sample_steps,
            base_variance=self.config.base_variance,
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

    def get_metrics_dict(self, params, outputs, batch) -> Dict:
        m = super().get_metrics_dict(params, outputs, batch)
        inv_s = self.field.get_inv_s(params["field"])[0]
        m["s_val"] = inv_s
        m["inv_s"] = 1.0 / inv_s
        return m
