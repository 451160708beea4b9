"""BakedSDF model (VolSDF rendering + proposal sampler + beta anneal).

Functional spec: reference nerfstudio/models/bakedsdf.py:40-312.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp

from sdfstudio_tpu.components import losses as L
from sdfstudio_tpu.core.rays import RayBundle
from sdfstudio_tpu.fields.density_field import HashMLPDensityField
from sdfstudio_tpu.models.volsdf import VolSDFModel, VolSDFModelConfig
from sdfstudio_tpu.ops import render as R
from sdfstudio_tpu.samplers.proposal import proposal_network_sampler

import jax


@dataclasses.dataclass(frozen=True)
class BakedSDFModelConfig(VolSDFModelConfig):
    num_proposal_samples_per_ray: Tuple[int, ...] = (256, 96)
    num_neus_samples_per_ray: int = 48
    proposal_update_every: int = 5
    proposal_warmup: int = 5000
    num_proposal_iterations: int = 2
    use_same_proposal_network: bool = False
    proposal_net_args_list: Tuple[Dict, ...] = (
        {"hidden_dim": 16, "log2_hashmap_size": 17, "num_levels": 5, "max_res": 64},
        {"hidden_dim": 16, "log2_hashmap_size": 17, "num_levels": 5, "max_res": 256},
    )
    interlevel_loss_mult: float = 1.0
    use_proposal_weight_anneal: bool = True
    proposal_weights_anneal_slope: float = 10.0
    proposal_weights_anneal_max_num_iters: int = 1000
    use_single_jitter: bool = True
    use_anneal_beta: bool = True
    beta_anneal_max_num_iters: int = 250000
    beta_anneal_init: float = 0.1
    beta_anneal_end: float = 0.001
    use_anneal_eikonal_weight: bool = False
    eikonal_anneal_max_num_iters: int = 250000
    use_spatial_varying_eikonal_loss: bool = False
    eikonal_loss_mult_start: float = 0.01
    eikonal_loss_mult_end: float = 0.1
    eikonal_loss_mult_slop: float = 2.0


class BakedSDFFactoModel(VolSDFModel):
    config: BakedSDFModelConfig

    def __init__(self, config, scene_box, num_train_data):
        super().__init__(config, scene_box, num_train_data)
        cfg = config
        n = cfg.num_proposal_iterations
        self.proposal_networks = []
        for i in range(n if not cfg.use_same_proposal_network else 1):
            args = cfg.proposal_net_args_list[min(i, len(cfg.proposal_net_args_list) - 1)]
            self.proposal_networks.append(
                HashMLPDensityField(
                    aabb=scene_box.aabb,
                    spatial_distortion=cfg.scene_contraction_norm,
                    **args,
                )
            )
        if cfg.use_same_proposal_network:
            self.proposal_networks = self.proposal_networks * n

    def init(self, rng):
        params = super().init(rng)
        keys = jax.random.split(jax.random.fold_in(rng, 17), len(self.proposal_networks))
        if self.config.use_same_proposal_network:
            params["proposal_networks"] = {"0": self.proposal_networks[0].init(keys[0])}
        else:
            params["proposal_networks"] = {
                str(i): net.init(keys[i]) for i, net in enumerate(self.proposal_networks)
            }
        return params

    # ------------------------------------------------------------------
    def schedules(self, step: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        sched = super().schedules(step)
        if cfg.use_proposal_weight_anneal:
            N = cfg.proposal_weights_anneal_max_num_iters
            b = cfg.proposal_weights_anneal_slope
            x = jnp.clip(step / N, 0.0, 1.0)
            sched["proposal_anneal"] = (b * x) / ((b - 1) * x + 1)
        else:
            sched["proposal_anneal"] = jnp.asarray(1.0)

        if cfg.use_anneal_beta:
            # bakedsdf beta schedule (bakedsdf.py:197-204); overrides the
            # learned laplace beta
            M = cfg.beta_anneal_max_num_iters
            b0, b1 = cfg.beta_anneal_init, cfg.beta_anneal_end
            t = jnp.clip(step / M, 0.0, 1.0)
            sched["beta_override"] = b0 / (1 + (b0 - b1) / b1 * (t**0.8))

        if cfg.use_anneal_eikonal_weight:
            # eikonal weight anneal (bakedsdf.py:217-236)
            K = cfg.eikonal_anneal_max_num_iters
            w0, w1 = 0.01, 0.1
            t = jnp.clip(step / K, 0.0, 1.0)
            sched["eikonal_mult"] = w1 / (1 + (w1 - w0) / w0 * ((1.0 - t) ** 10))
        return sched

    # ------------------------------------------------------------------
    def sample_and_forward_field(self, params, ray_bundle: RayBundle, rng, sched, train) -> Dict:
        """Reference bakedsdf.py:239-262."""
        cfg = self.config
        if cfg.use_same_proposal_network:
            nets_params = [params["proposal_networks"]["0"]] * cfg.num_proposal_iterations
        else:
            nets_params = [
                params["proposal_networks"][str(i)] for i in range(cfg.num_proposal_iterations)
            ]
        density_fns = [
            net.density_fn(p) for net, p in zip(self.proposal_networks, nets_params)
        ]
        ray_samples, weights_list, ray_samples_list = proposal_network_sampler(
            ray_bundle,
            density_fns,
            rng=rng if train else None,
            num_proposal_samples_per_ray=cfg.num_proposal_samples_per_ray,
            num_nerf_samples_per_ray=cfg.num_neus_samples_per_ray,
            num_proposal_network_iterations=cfg.num_proposal_iterations,
            single_jitter=cfg.use_single_jitter,
            anneal=sched["proposal_anneal"],
            train_proposal=train,
        )
        field_outputs = self.field.get_outputs(
            params["field"],
            ray_samples,
            hash_mask=sched.get("hash_mask"),
            numerical_delta=sched.get("numerical_delta"),
            beta_override=sched.get("beta_override"),
            train=train,
        )
        field_outputs["alpha"] = R.alphas_from_densities(
            ray_samples.deltas, field_outputs["density"]
        )
        if cfg.background_model != "none":
            field_outputs = self.forward_background_field_and_merge(
                params, ray_samples, field_outputs, train
            )
        weights, transmittance = R.weights_and_transmittance_from_alphas(
            field_outputs["alpha"]
        )
        weights_list = list(weights_list) + [weights]
        ray_samples_list = list(ray_samples_list) + [ray_samples]
        return {
            "ray_samples": ray_samples,
            "field_outputs": field_outputs,
            "weights": weights,
            "bg_transmittance": transmittance[:, -1:],
            "weights_list": weights_list,
            "ray_samples_list": ray_samples_list,
        }

    # ------------------------------------------------------------------
    def get_loss_dict(self, params, outputs, batch, sched, rng=None) -> Dict:
        """Reference bakedsdf.py:264-297 — rgb + eikonal (optionally
        spatially varying) + interlevel (+ s3im)."""
        cfg = self.config
        loss_dict = {}
        image = batch["image"]
        loss_dict["rgb_loss"] = L.l1_loss(image, outputs["rgb"])

        grad_theta = outputs["eik_grad"]
        if cfg.s3im_loss_mult > 0 and rng is not None:
            loss_dict["s3im_loss"] = (
                L.s3im_loss(outputs["rgb"], image, rng,
                            kernel_size=cfg.s3im_kernel_size, stride=cfg.s3im_stride,
                            repeat_time=cfg.s3im_repeat_time, patch_height=cfg.s3im_patch_height)
                * cfg.s3im_loss_mult
            )
        if cfg.use_spatial_varying_eikonal_loss:
            points_norm = outputs["points_norm"]
            pw = jnp.where(points_norm <= 1, jnp.ones_like(points_norm), points_norm)
            w0 = cfg.eikonal_loss_mult_start
            w1 = cfg.eikonal_loss_mult_end
            slop = cfg.eikonal_loss_mult_slop
            pw = w1 / (1 + (w1 - w0) / w0 * ((2.0 - pw) ** slop))
            eik = (jnp.linalg.norm(grad_theta, axis=-1) - 1) ** 2
            loss_dict["eikonal_loss"] = jnp.mean(eik * pw)
        else:
            mult = sched.get("eikonal_mult", cfg.eikonal_loss_mult)
            loss_dict["eikonal_loss"] = L.eikonal_loss(grad_theta) * mult

        loss_dict["interlevel_loss"] = cfg.interlevel_loss_mult * L.interlevel_loss(
            outputs["weights_list"], outputs["ray_samples_list"]
        )
        return loss_dict
