"""NeuS-facto: NeuS + proposal-network sampling + Neuralangelo schedules.

Functional spec: reference nerfstudio/models/neus_facto.py:42-352. Every
training callback (proposal-weight anneal, beta anneal, progressive hash
mask, numerical-grad delta, curvature warmup/decay — neus_facto.py:154-276)
is a pure function of ``step`` inside :meth:`schedules`, traced into the
train step.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from sdfstudio_tpu.components import losses as L
from sdfstudio_tpu.core.rays import RayBundle
from sdfstudio_tpu.fields.density_field import HashMLPDensityField
from sdfstudio_tpu.models.neus import NeuSModel, NeuSModelConfig
from sdfstudio_tpu.ops import render as R
from sdfstudio_tpu.samplers.proposal import proposal_network_sampler


@dataclasses.dataclass(frozen=True)
class NeuSFactoModelConfig(NeuSModelConfig):
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
    use_anneal_beta: bool = False
    beta_anneal_max_num_iters: int = 1000_000
    beta_anneal_init: float = 0.05
    beta_anneal_end: float = 0.0002
    enable_progressive_hash_encoding: bool = False
    enable_numerical_gradients_schedule: bool = False
    enable_curvature_loss_schedule: bool = False
    curvature_loss_multi: float = 0.0
    curvature_loss_warmup_steps: int = 20_000
    level_init: int = 4
    steps_per_level: int = 10_000


class NeuSFactoModel(NeuSModel):
    config: NeuSFactoModelConfig

    def __init__(self, config, scene_box, num_train_data):
        super().__init__(config, scene_box, num_train_data)
        cfg = config
        n = cfg.num_proposal_iterations
        self.proposal_networks = []
        if cfg.use_same_proposal_network:
            args = cfg.proposal_net_args_list[0]
            net = HashMLPDensityField(
                aabb=scene_box.aabb,
                spatial_distortion=cfg.scene_contraction_norm,
                **args,
            )
            self.proposal_networks = [net] * n
        else:
            for i in range(n):
                args = cfg.proposal_net_args_list[min(i, len(cfg.proposal_net_args_list) - 1)]
                self.proposal_networks.append(
                    HashMLPDensityField(
                        aabb=scene_box.aabb,
                        spatial_distortion=cfg.scene_contraction_norm,
                        **args,
                    )
                )

    # ------------------------------------------------------------------
    def init(self, rng: jax.Array):
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
            # mip-360 eq.18 bias anneal (neus_facto.py:159-168)
            N = cfg.proposal_weights_anneal_max_num_iters
            b = cfg.proposal_weights_anneal_slope
            x = jnp.clip(step / N, 0.0, 1.0)
            sched["proposal_anneal"] = (b * x) / ((b - 1) * x + 1)
        else:
            sched["proposal_anneal"] = jnp.asarray(1.0)

        # proposal update cadence as a pure function of step (reference
        # keeps a steps_since_update counter + update_sched ramp,
        # nerfacto.py update_schedule / ray_samplers.py:551): the threshold
        # ramps 0 -> update_every over proposal_warmup; update when the
        # step hits the ramped period. Non-update steps skip the proposal
        # backward entirely (lax.cond in the sampler) and freeze the group.
        thr = jnp.clip(
            step * cfg.proposal_update_every / max(cfg.proposal_warmup, 1),
            1.0,
            float(cfg.proposal_update_every),
        )
        period = jnp.floor(thr) + 1.0
        sched["train_proposal"] = jnp.logical_or(
            step < 10.0, jnp.mod(jnp.floor(step), period) < 0.5
        )

        if cfg.use_anneal_beta:
            # bakedsdf beta schedule adapted to neus (neus_facto.py:185-204)
            M = cfg.beta_anneal_max_num_iters
            b0, b1 = cfg.beta_anneal_init, cfg.beta_anneal_end
            t = jnp.clip(step / M, 0.0, 1.0)
            beta = b0 / (1 + (b0 - b1) / b1 * (t**0.8))
            sched["inv_s_override"] = 1.0 / beta

        fcfg = self.field.config
        growth = (
            math.exp((math.log(fcfg.max_res) - math.log(fcfg.base_res)) / (fcfg.num_levels - 1))
            if fcfg.num_levels > 1
            else 1.0
        )
        spl = cfg.steps_per_level

        if cfg.enable_numerical_gradients_schedule:
            # delta decays with the active grid resolution (neus_facto.py:220-235);
            # x4 compensates the (x+2)/4 input normalization
            delta = 1.0 / (fcfg.base_res * growth ** (step / spl))
            delta = jnp.maximum(1.0 / (4.0 * fcfg.max_res), delta)
            sched["numerical_delta"] = delta * 4.0

        if cfg.enable_progressive_hash_encoding:
            # progressive levels (neus_facto.py:238-252)
            level = jnp.maximum(
                jnp.floor(step / spl).astype(jnp.int32) + 1, cfg.level_init
            )
            feat_level = (
                jnp.arange(fcfg.num_levels * fcfg.hash_features_per_level)
                // fcfg.hash_features_per_level
            )
            sched["hash_mask"] = (feat_level < level).astype(jnp.float32)

        if cfg.enable_curvature_loss_schedule:
            # linear warmup then decay with delta (neus_facto.py:256-276)
            w = cfg.curvature_loss_warmup_steps
            init_delta = 1.0 / fcfg.base_res
            decay = 1.0 / (fcfg.base_res * growth ** ((step - w) / spl))
            decay = jnp.maximum(1.0 / (fcfg.max_res * 10.0), decay)
            sched["curvature_factor"] = jnp.where(step < w, step / w, decay / init_delta)
        else:
            sched["curvature_factor"] = jnp.asarray(1.0)

        return sched

    # ------------------------------------------------------------------
    def sample_and_forward_field(self, params, ray_bundle: RayBundle, rng, sched, train) -> Dict:
        """Reference neus_facto.py:282-303."""
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

        sampler_rng = rng if (train and cfg.perturb) else None
        ray_samples, weights_list, ray_samples_list = proposal_network_sampler(
            ray_bundle,
            density_fns,
            rng=sampler_rng,
            num_proposal_samples_per_ray=cfg.num_proposal_samples_per_ray,
            num_nerf_samples_per_ray=cfg.num_neus_samples_per_ray,
            num_proposal_network_iterations=cfg.num_proposal_iterations,
            single_jitter=cfg.use_single_jitter,
            anneal=sched["proposal_anneal"],
            train_proposal=sched["train_proposal"] if train else False,
            # MLP proposal fields: fuse the stage (masked-cotangent gate);
            # hash proposal fields keep lax.cond to skip backward scatters
            grad_gate=(
                "where"
                if all(n.field_type == "mlp" for n in self.proposal_networks)
                else "cond"
            ),
        )

        field_outputs = self.field.get_outputs(
            params["field"],
            ray_samples,
            hash_mask=sched.get("hash_mask"),
            cos_anneal_ratio=sched["cos_anneal_ratio"],
            numerical_delta=sched.get("numerical_delta"),
            inv_s_override=sched.get("inv_s_override"),
            return_alphas=True,
            train=train,
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
        loss_dict = super().get_loss_dict(params, outputs, batch, sched, rng)
        cfg = self.config

        loss_dict["interlevel_loss"] = cfg.interlevel_loss_mult * L.interlevel_loss_zip(
            outputs["weights_list"], outputs["ray_samples_list"]
        )

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

    def get_metrics_dict(self, params, outputs, batch) -> Dict:
        m = super().get_metrics_dict(params, outputs, batch)
        return m
