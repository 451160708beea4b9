"""DtoO: density-to-occupancy distillation model.

Functional spec: reference nerfstudio/models/dto.py:40-577 — a nerfacto
(density) backbone trained for view synthesis, with a separate SDF/occupancy
field (param group "occupancy_field") trained ON TOP via density-guided
sampling: points sampled near the density surface supervise the SDF's
occupancy (sigmoid(-10 sdf)) against the density field's rendered
occupancy, plus an eikonal regularizer. The reference also keeps occupancy
grids and marching-cubes visualization hooks; mesh extraction goes through
sst-extract-mesh on the distilled SDF field.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from sdfstudio_tpu.components import losses as L
from sdfstudio_tpu.fields.sdf_field import SDFField, SDFFieldConfig, analytic_sdf_gradient
from sdfstudio_tpu.models.nerfacto import NerfactoModel, NerfactoModelConfig
from sdfstudio_tpu.ops import render as R
from sdfstudio_tpu.ops.density import unisurf_occupancy


@dataclasses.dataclass(frozen=True)
class DtoOModelConfig(NerfactoModelConfig):
    sdf_field: SDFFieldConfig = SDFFieldConfig(use_grid_feature=True, inside_outside=False)
    occupancy_loss_mult: float = 1.0
    sdf_eikonal_loss_mult: float = 0.1
    surface_weight_threshold: float = 1e-2


class DtoOModel(NerfactoModel):
    config: DtoOModelConfig

    def __init__(self, config, scene_box, num_train_data):
        super().__init__(config, scene_box, num_train_data)
        self.occupancy_field = SDFField(
            config=config.sdf_field,
            num_images=num_train_data,
            spatial_distortion="inf",
        )

    def init(self, rng: jax.Array) -> Dict[str, Any]:
        params = super().init(rng)
        params["occupancy_field"] = self.occupancy_field.init(jax.random.fold_in(rng, 31))
        return params

    def get_outputs(self, params, ray_bundle, rng=None, sched=None, train=True) -> Dict:
        outputs = super().get_outputs(params, ray_bundle, rng=rng, sched=sched, train=train)
        if not train:
            return outputs
        ray_samples = outputs["ray_samples_list"][-1]
        weights = jax.lax.stop_gradient(outputs["weights_list"][-1])  # [R, S]

        # density-guided occupancy targets: transmittance-based "behind the
        # surface" indicator (cumulative weight past each sample)
        cum_w = jnp.cumsum(weights, axis=-1)
        occ_target = jnp.clip(cum_w, 0.0, 1.0)

        pts = jax.lax.stop_gradient(ray_samples.get_start_positions())
        pts_flat = self.occupancy_field.contract_positions(pts.reshape(-1, 3))
        geonet = self.occupancy_field.geonetwork_fn(params["occupancy_field"])
        sdf = geonet(pts_flat)[..., 0]
        occ_pred = unisurf_occupancy(sdf).reshape(occ_target.shape)
        grads = analytic_sdf_gradient(
            lambda p: geonet(p)[..., 0], pts_flat,
            mode=self.config.sdf_field.analytic_gradient_mode,
        )
        outputs["occ_pred"] = occ_pred
        outputs["occ_target"] = occ_target
        outputs["sdf_eik_grad"] = grads
        return outputs

    def get_loss_dict(self, params, outputs, batch, sched, rng=None) -> Dict:
        loss_dict = super().get_loss_dict(params, outputs, batch, sched, rng)
        cfg = self.config
        if "occ_pred" in outputs:
            loss_dict["occupancy_loss"] = cfg.occupancy_loss_mult * jnp.mean(
                (outputs["occ_pred"] - outputs["occ_target"]) ** 2
            )
            loss_dict["sdf_eikonal_loss"] = cfg.sdf_eikonal_loss_mult * L.eikonal_loss(
                outputs["sdf_eik_grad"]
            )
        return loss_dict
