"""BakedAngelo: BakedSDF + Neuralangelo schedules + curvature loss.

Functional spec: reference nerfstudio/models/bakedangelo.py:40-180.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict

import jax.numpy as jnp

from sdfstudio_tpu.components import losses as L
from sdfstudio_tpu.models.bakedsdf import BakedSDFFactoModel, BakedSDFModelConfig


@dataclasses.dataclass(frozen=True)
class BakedAngeloModelConfig(BakedSDFModelConfig):
    enable_progressive_hash_encoding: bool = True
    enable_numerical_gradients_schedule: bool = True
    enable_curvature_loss_schedule: bool = True
    curvature_loss_multi: float = 5e-4
    curvature_loss_warmup_steps: int = 5000
    level_init: int = 4
    steps_per_level: int = 5000


class BakedAngeloModel(BakedSDFFactoModel):
    config: BakedAngeloModelConfig

    def schedules(self, step: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        sched = super().schedules(step)
        fcfg = self.field.config
        growth = (
            math.exp((math.log(fcfg.max_res) - math.log(fcfg.base_res)) / (fcfg.num_levels - 1))
            if fcfg.num_levels > 1
            else 1.0
        )
        spl = cfg.steps_per_level

        if cfg.enable_numerical_gradients_schedule:
            delta = 1.0 / (fcfg.base_res * growth ** (step / spl))
            delta = jnp.maximum(1.0 / (4.0 * fcfg.max_res), delta)
            sched["numerical_delta"] = delta * 4.0  # bakedangelo.py:99

        if cfg.enable_progressive_hash_encoding:
            level = jnp.maximum(
                jnp.floor(step / spl).astype(jnp.int32) + 1, cfg.level_init
            )
            feat_level = (
                jnp.arange(fcfg.num_levels * fcfg.hash_features_per_level)
                // fcfg.hash_features_per_level
            )
            sched["hash_mask"] = (feat_level < level).astype(jnp.float32)

        if cfg.enable_curvature_loss_schedule:
            w = cfg.curvature_loss_warmup_steps
            init_delta = 1.0 / fcfg.base_res
            decay = 1.0 / (fcfg.base_res * growth ** ((step - w) / spl))
            decay = jnp.maximum(1.0 / (fcfg.max_res * 10.0), decay)
            sched["curvature_factor"] = jnp.where(step < w, step / w, decay / init_delta)
        else:
            sched["curvature_factor"] = jnp.asarray(1.0)
        return sched

    def get_loss_dict(self, params, outputs, batch, sched, rng=None) -> Dict:
        loss_dict = super().get_loss_dict(params, outputs, batch, sched, rng)
        cfg = self.config
        if cfg.curvature_loss_multi > 0.0 and "sampled_sdf" in outputs["field_outputs"]:
            delta = sched.get("numerical_delta", jnp.asarray(1e-4))
            loss_dict["curvature_loss"] = (
                L.curvature_loss(
                    outputs["field_outputs"]["sampled_sdf"],
                    outputs["field_outputs"]["sdf"],
                    delta,
                )
                * cfg.curvature_loss_multi
                * sched["curvature_factor"]
            )
        return loss_dict
