"""Nerfacto model (proposal sampling + hash-grid field).

Functional spec: reference nerfstudio/models/nerfacto.py:60-357.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from sdfstudio_tpu.components import losses as L
from sdfstudio_tpu.core.math import safe_normalize
from sdfstudio_tpu.core.rays import RayBundle
from sdfstudio_tpu.fields.density_field import HashMLPDensityField
from sdfstudio_tpu.fields.nerfacto_field import NerfactoField, NerfactoFieldNet
from sdfstudio_tpu.models.base_model import Model, ModelConfig
from sdfstudio_tpu.ops import render as R
from sdfstudio_tpu.ops.density import trunc_exp
from sdfstudio_tpu.samplers.proposal import proposal_network_sampler


@dataclasses.dataclass(frozen=True)
class NerfactoModelConfig(ModelConfig):
    near_plane: float = 0.05
    far_plane: float = 1000.0
    background_color: str = "last_sample"
    num_levels: int = 16
    max_res: int = 1024
    log2_hashmap_size: int = 19
    num_proposal_samples_per_ray: Tuple[int, ...] = (256, 96)
    num_nerf_samples_per_ray: int = 48
    proposal_update_every: int = 5
    proposal_warmup: int = 5000
    num_proposal_iterations: int = 2
    use_same_proposal_network: bool = False
    proposal_net_args_list: Tuple[Dict, ...] = (
        {"hidden_dim": 16, "log2_hashmap_size": 17, "num_levels": 5, "max_res": 64},
        {"hidden_dim": 16, "log2_hashmap_size": 17, "num_levels": 5, "max_res": 256},
    )
    interlevel_loss_mult: float = 1.0
    distortion_loss_mult: float = 0.002
    orientation_loss_mult: float = 1e-4
    pred_normal_loss_mult: float = 1e-3
    use_proposal_weight_anneal: bool = True
    use_average_appearance_embedding: bool = True
    proposal_weights_anneal_slope: float = 10.0
    proposal_weights_anneal_max_num_iters: int = 1000
    use_single_jitter: bool = True
    predict_normals: bool = False
    eval_num_rays_per_chunk: int = 4096


class NerfactoModel(Model):
    config: NerfactoModelConfig

    def __init__(self, config, scene_box, num_train_data):
        super().__init__(config, scene_box, num_train_data)
        self.field = NerfactoField(
            spatial_distortion="inf",
            num_images=num_train_data,
            use_average_appearance_embedding=config.use_average_appearance_embedding,
            num_levels=config.num_levels,
            max_res=config.max_res,
            log2_hashmap_size=config.log2_hashmap_size,
            use_pred_normals=config.predict_normals,
        )
        n = config.num_proposal_iterations
        self.proposal_networks = []
        for i in range(1 if config.use_same_proposal_network else n):
            args = config.proposal_net_args_list[min(i, len(config.proposal_net_args_list) - 1)]
            self.proposal_networks.append(
                HashMLPDensityField(aabb=scene_box.aabb, spatial_distortion="inf", **args)
            )
        if config.use_same_proposal_network:
            self.proposal_networks = self.proposal_networks * n

    def init(self, rng: jax.Array) -> Dict[str, Any]:
        keys = jax.random.split(rng, 1 + len(self.proposal_networks))
        params = {"field": self.field.init(keys[0])}
        if self.config.use_same_proposal_network:
            params["proposal_networks"] = {"0": self.proposal_networks[0].init(keys[1])}
        else:
            params["proposal_networks"] = {
                str(i): n.init(keys[1 + i]) for i, n in enumerate(self.proposal_networks)
            }
        return params

    def schedules(self, step: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        sched = {}
        if cfg.use_proposal_weight_anneal:
            N = cfg.proposal_weights_anneal_max_num_iters
            b = cfg.proposal_weights_anneal_slope
            x = jnp.clip(step / N, 0.0, 1.0)
            sched["proposal_anneal"] = (b * x) / ((b - 1) * x + 1)
        else:
            sched["proposal_anneal"] = jnp.asarray(1.0)
        # proposal update cadence (see neus_facto.py schedules; reference
        # nerfacto.py update_schedule + ray_samplers.py:551)
        thr = jnp.clip(
            step * cfg.proposal_update_every / max(cfg.proposal_warmup, 1),
            1.0,
            float(cfg.proposal_update_every),
        )
        period = jnp.floor(thr) + 1.0
        sched["train_proposal"] = jnp.logical_or(
            step < 10.0, jnp.mod(jnp.floor(step), period) < 0.5
        )
        return sched

    def apply_collider(self, ray_bundle: RayBundle, train: bool = True) -> RayBundle:
        from sdfstudio_tpu.components.colliders import near_far_collider

        return near_far_collider(ray_bundle, self.config.near_plane, self.config.far_plane)

    def get_outputs(self, params, ray_bundle: RayBundle, rng=None, sched=None, train=True) -> Dict:
        cfg = self.config
        sched = sched or self.schedules(jnp.asarray(1e9))
        ray_bundle = self.apply_collider(ray_bundle, train)

        if cfg.use_same_proposal_network:
            nets_params = [params["proposal_networks"]["0"]] * cfg.num_proposal_iterations
        else:
            nets_params = [params["proposal_networks"][str(i)] for i in range(cfg.num_proposal_iterations)]
        density_fns = [n.density_fn(p) for n, p in zip(self.proposal_networks, nets_params)]

        ray_samples, weights_list, ray_samples_list = proposal_network_sampler(
            ray_bundle,
            density_fns,
            rng=rng if train else None,
            num_proposal_samples_per_ray=cfg.num_proposal_samples_per_ray,
            num_nerf_samples_per_ray=cfg.num_nerf_samples_per_ray,
            num_proposal_network_iterations=cfg.num_proposal_iterations,
            single_jitter=cfg.use_single_jitter,
            anneal=sched["proposal_anneal"],
            train_proposal=sched["train_proposal"] if train else False,
            grad_gate=(
                "where"
                if all(n.field_type == "mlp" for n in self.proposal_networks)
                else "cond"
            ),
        )

        field_outputs = self.field.get_outputs(params["field"], ray_samples, train=train)
        if cfg.predict_normals:
            # density normals via grad of density wrt positions
            pts = ray_samples.get_positions().reshape(-1, 3)

            def density_sum(p):
                p01 = self.field.normalize(p)
                raw, _ = self.field.module.apply(
                    {"params": params["field"]}, p01, method=NerfactoFieldNet.density_raw
                )
                return jnp.sum(trunc_exp(raw))

            grads = jax.grad(density_sum)(pts)
            normals = -safe_normalize(grads).reshape(*ray_samples.starts.shape, 3)
            field_outputs["normals"] = normals

        weights = R.weights_from_densities(ray_samples.deltas, field_outputs["density"])
        weights_list = list(weights_list) + [weights]
        ray_samples_list = list(ray_samples_list) + [ray_samples]

        rgb = R.render_rgb(field_outputs["rgb"], weights, cfg.background_color)
        depth = R.render_depth_median(weights, ray_samples.starts, ray_samples.ends)
        accumulation = R.render_accumulation(weights)

        outputs = {
            "rgb": rgb,
            "accumulation": accumulation,
            "depth": depth,
            "weights_list": weights_list,
            "ray_samples_list": ray_samples_list,
        }
        if cfg.predict_normals:
            outputs["normals"] = R.render_normals(field_outputs["normals"], weights, normalize=True)
            outputs["pred_normals"] = R.render_normals(field_outputs["pred_normals"], weights, normalize=True)
            if train:
                wd = jax.lax.stop_gradient(weights)
                outputs["rendered_orientation_loss"] = L.orientation_loss(
                    wd, field_outputs["normals"], ray_bundle.directions
                )
                outputs["rendered_pred_normal_loss"] = L.pred_normal_loss(
                    wd,
                    jax.lax.stop_gradient(field_outputs["normals"]),
                    field_outputs["pred_normals"],
                )
        for i in range(cfg.num_proposal_iterations):
            outputs[f"prop_depth_{i}"] = R.render_depth_median(
                weights_list[i], ray_samples_list[i].starts, ray_samples_list[i].ends
            )
        if getattr(self, "keep_field_outputs", False):
            # subclasses with extra heads (semantic-nerfw) consume the raw
            # field outputs and pop this key before returning
            outputs["field_outputs"] = field_outputs
            outputs["ray_samples"] = ray_samples
        return outputs

    def get_loss_dict(self, params, outputs, batch, sched, rng=None) -> Dict:
        cfg = self.config
        image = batch["image"]
        loss_dict = {"rgb_loss": jnp.mean((image - outputs["rgb"]) ** 2)}
        loss_dict["interlevel_loss"] = cfg.interlevel_loss_mult * L.interlevel_loss(
            outputs["weights_list"], outputs["ray_samples_list"]
        )
        loss_dict["distortion_loss"] = cfg.distortion_loss_mult * L.distortion_loss(
            outputs["weights_list"], outputs["ray_samples_list"]
        )
        if cfg.predict_normals:
            loss_dict["orientation_loss"] = cfg.orientation_loss_mult * jnp.mean(
                outputs["rendered_orientation_loss"]
            )
            loss_dict["pred_normal_loss"] = cfg.pred_normal_loss_mult * jnp.mean(
                outputs["rendered_pred_normal_loss"]
            )
        return loss_dict

    def get_metrics_dict(self, params, outputs, batch) -> Dict:
        m = super().get_metrics_dict(params, outputs, batch)
        m["distortion"] = L.distortion_loss(outputs["weights_list"], outputs["ray_samples_list"])
        return m
