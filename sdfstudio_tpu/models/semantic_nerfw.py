"""Semantic NeRF-W model.

Functional spec: reference nerfstudio/models/semantic_nerfw.py — nerfacto
backbone + NeRF-W transient head (uncertainty-weighted rgb loss, transient
density regularizer) + semantic head with cross-entropy supervision.
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from sdfstudio_tpu.models.nerfacto import NerfactoModel, NerfactoModelConfig
from sdfstudio_tpu.ops import render as R


@dataclasses.dataclass(frozen=True)
class SemanticNerfWModelConfig(NerfactoModelConfig):
    num_semantic_classes: int = 100
    use_transient_embedding: bool = True
    semantic_loss_weight: float = 1.0
    pass_semantic_gradients: bool = False
    uncertainty_min: float = 0.03


class SemanticNerfWModel(NerfactoModel):
    config: SemanticNerfWModelConfig

    def __init__(self, config, scene_box, num_train_data):
        super().__init__(config, scene_box, num_train_data)
        # rebuild the field with transient + semantic heads
        from sdfstudio_tpu.fields.nerfacto_field import NerfactoField

        self.field = NerfactoField(
            spatial_distortion="inf",
            num_images=num_train_data,
            use_average_appearance_embedding=config.use_average_appearance_embedding,
            num_levels=config.num_levels,
            max_res=config.max_res,
            log2_hashmap_size=config.log2_hashmap_size,
            use_transient_embedding=config.use_transient_embedding,
            use_semantics=True,
            num_semantic_classes=config.num_semantic_classes,
        )

    keep_field_outputs = True  # nerfacto stashes raw field outputs for us

    def get_outputs(self, params, ray_bundle, rng=None, sched=None, train=True) -> Dict:
        outputs = super().get_outputs(params, ray_bundle, rng=rng, sched=sched, train=train)
        ray_samples = outputs.pop("ray_samples")
        field_outputs = outputs.pop("field_outputs")
        weights_static = outputs["weights_list"][-1]

        if train and self.config.use_transient_embedding and "transient_density" in field_outputs:
            # NeRF-W combined rendering (reference semantic_nerfw.py:176-187):
            # BOTH components render with the combined-density weights
            density_combined = field_outputs["density"] + field_outputs["transient_density"]
            weights_combined = R.weights_from_densities(ray_samples.deltas, density_combined)
            rgb_combined = jnp.sum(
                weights_combined[..., None] * field_outputs["rgb"], axis=-2
            ) + jnp.sum(
                weights_combined[..., None] * field_outputs["transient_rgb"], axis=-2
            )
            # uncertainty renders with the TRANSIENT-only weights
            # (semantic_nerfw.py:204-207)
            weights_transient = R.weights_from_densities(
                ray_samples.deltas, field_outputs["transient_density"]
            )
            uncertainty = (
                R.render_uncertainty(field_outputs["transient_uncertainty"], weights_transient)
                + self.config.uncertainty_min
            )
            outputs["rgb"] = rgb_combined
            outputs["uncertainty"] = uncertainty
            outputs["transient_density"] = field_outputs["transient_density"]

        # semantics always render with detached STATIC weights
        # (semantic_nerfw.py:210-212)
        sem_w = (
            weights_static
            if self.config.pass_semantic_gradients
            else jax.lax.stop_gradient(weights_static)
        )
        outputs["semantics"] = R.render_semantics(field_outputs["semantics"], sem_w)
        if not train:
            # host-side colormap lookup renders these (reference
            # semantic_nerfw.py:216-218 uses the dataparser's class colors)
            outputs["semantics_labels"] = jnp.argmax(outputs["semantics"], axis=-1)
        return outputs

    def get_loss_dict(self, params, outputs, batch, sched, rng=None) -> Dict:
        cfg = self.config
        loss_dict = super().get_loss_dict(params, outputs, batch, sched, rng)
        image = batch["image"]
        if "uncertainty" in outputs:
            # NeRF-W losses exactly as the reference computes them
            # (semantic_nerfw.py:239-243): channel-SUMMED sq error / beta^2
            beta = outputs["uncertainty"]
            loss_dict["rgb_loss"] = jnp.mean(
                jnp.sum((image - outputs["rgb"]) ** 2, axis=-1) / (beta[..., 0] ** 2)
            )
            loss_dict["uncertainty_loss"] = 3.0 + jnp.mean(jnp.log(beta))
            loss_dict["density_loss"] = 0.01 * jnp.mean(outputs["transient_density"])
        if "semantics" in batch:
            labels = batch["semantics"].astype(jnp.int32)
            logits = outputs["semantics"]
            loss_dict["semantics_loss"] = cfg.semantic_loss_weight * jnp.mean(
                -jax.nn.log_softmax(logits)[jnp.arange(labels.shape[0]), labels]
            )
        return loss_dict
