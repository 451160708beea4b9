"""Vanilla NeRF (coarse + fine) and mip-NeRF models.

Functional spec: reference nerfstudio/models/vanilla_nerf.py:48-200 and
nerfstudio/models/mipnerf.py (single shared field with IPE, coarse+fine).
Includes the DNeRF temporal distortion hook
(field_components/temporal_distortions.py).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sdfstudio_tpu.core.rays import RayBundle
from sdfstudio_tpu.fields.vanilla_nerf_field import NeRFField
from sdfstudio_tpu.models.base_model import Model, ModelConfig
from sdfstudio_tpu.ops import render as R
from sdfstudio_tpu.ops.encodings import NeRFEncoding
from sdfstudio_tpu.ops.mlp import MLP
from sdfstudio_tpu.samplers.pdf import pdf_sampler
from sdfstudio_tpu.samplers.spaced import uniform_sampler


class DNeRFDistortion(nn.Module):
    """DNeRF deformation field (reference
    field_components/temporal_distortions.py): (x, t) -> offset."""

    position_frequencies: int = 10
    temporal_frequencies: int = 10
    mlp_num_layers: int = 4
    mlp_layer_width: int = 256

    @nn.compact
    def __call__(self, positions: jnp.ndarray, times: jnp.ndarray) -> jnp.ndarray:
        pe = NeRFEncoding(
            in_dim=3, num_frequencies=self.position_frequencies,
            min_freq_exp=0.0, max_freq_exp=self.position_frequencies - 1.0, include_input=True,
        )(positions)
        te = NeRFEncoding(
            in_dim=1, num_frequencies=self.temporal_frequencies,
            min_freq_exp=0.0, max_freq_exp=self.temporal_frequencies - 1.0, include_input=True,
        )(times)
        h = jnp.concatenate([pe, te], axis=-1)
        offset = MLP(num_layers=self.mlp_num_layers, layer_width=self.mlp_layer_width, out_dim=3)(h)
        # zero offset at t=0 is learned, not enforced (matches reference)
        return offset


@dataclasses.dataclass(frozen=True)
class VanillaModelConfig(ModelConfig):
    num_coarse_samples: int = 64
    num_importance_samples: int = 128
    enable_temporal_distortion: bool = False
    background_color: str = "white"


class NeRFModel(Model):
    """Coarse+fine vanilla NeRF (reference vanilla_nerf.py:63-200)."""

    config: VanillaModelConfig
    use_integrated_encoding = False
    share_field = False

    def __init__(self, config, scene_box, num_train_data):
        super().__init__(config, scene_box, num_train_data)
        kw = dict(use_integrated_encoding=self.use_integrated_encoding)
        self.field_coarse = NeRFField(**kw)
        self.field_fine = (
            self.field_coarse if self.share_field else NeRFField(**kw)
        )
        self.temporal_distortion = (
            DNeRFDistortion() if config.enable_temporal_distortion else None
        )

    def init(self, rng: jax.Array) -> Dict[str, Any]:
        k1, k2, k3 = jax.random.split(rng, 3)
        params = {
            "field": {
                "coarse": self.field_coarse.init(k1),
                **({} if self.share_field else {"fine": self.field_fine.init(k2)}),
            }
        }
        if self.temporal_distortion is not None:
            params["temporal_distortion"] = self.temporal_distortion.init(
                k3, jnp.zeros((1, 3)), jnp.zeros((1, 1))
            )["params"]
        return params

    def _fine_params(self, params):
        return params["field"]["coarse" if self.share_field else "fine"]

    def _apply_distortion(self, params, ray_samples):
        if self.temporal_distortion is None or ray_samples.times is None:
            return None
        pts = ray_samples.get_positions()
        R_, S = pts.shape[0], pts.shape[1]
        times = jnp.broadcast_to(ray_samples.times[:, None, :], (R_, S, 1))
        return self.temporal_distortion.apply(
            {"params": params["temporal_distortion"]}, pts.reshape(-1, 3), times.reshape(-1, 1)
        ).reshape(R_, S, 3)

    def get_outputs(self, params, ray_bundle: RayBundle, rng=None, sched=None, train=True) -> Dict:
        ray_bundle = self.apply_collider(ray_bundle, train)
        rngs = list(jax.random.split(rng, 2)) if rng is not None else [None, None]

        rs_uniform = uniform_sampler(ray_bundle, self.config.num_coarse_samples, rng=rngs[0])
        # NB: temporal offsets shift positions before field eval
        offset = self._apply_distortion(params, rs_uniform)
        fo_coarse = self._field_outputs(params["field"]["coarse"], self.field_coarse, rs_uniform, offset, train)
        weights_coarse = R.weights_from_densities(rs_uniform.deltas, fo_coarse["density"])
        rgb_coarse = R.render_rgb(fo_coarse["rgb"], weights_coarse, self.config.background_color)
        acc_coarse = R.render_accumulation(weights_coarse)
        depth_coarse = R.render_depth_median(weights_coarse, rs_uniform.starts, rs_uniform.ends)

        rs_pdf = pdf_sampler(
            ray_bundle, rs_uniform, weights_coarse,
            num_samples=self.config.num_importance_samples, rng=rngs[1],
        )
        offset_f = self._apply_distortion(params, rs_pdf)
        fo_fine = self._field_outputs(self._fine_params(params), self.field_fine, rs_pdf, offset_f, train)
        weights_fine = R.weights_from_densities(rs_pdf.deltas, fo_fine["density"])
        rgb_fine = R.render_rgb(fo_fine["rgb"], weights_fine, self.config.background_color)
        acc_fine = R.render_accumulation(weights_fine)
        depth_fine = R.render_depth_median(weights_fine, rs_pdf.starts, rs_pdf.ends)

        return {
            "rgb": rgb_fine,
            "rgb_coarse": rgb_coarse,
            "rgb_fine": rgb_fine,
            "accumulation": acc_fine,
            "accumulation_coarse": acc_coarse,
            "depth": depth_fine,
            "depth_coarse": depth_coarse,
        }

    def _field_outputs(self, fparams, field, ray_samples, offset, train):
        if offset is not None:
            # shift positions through the deformation field
            shifted = ray_samples.replace(
                origins=ray_samples.origins  # offsets folded below
            )
            R_, S = ray_samples.starts.shape
            pts = ray_samples.get_positions() + offset
            dirs = jnp.broadcast_to(ray_samples.directions[:, None, :], (R_, S, 3)).reshape(-1, 3)
            out = field.module.apply({"params": fparams}, pts.reshape(-1, 3), dirs)
            return jax.tree_util.tree_map(lambda x: x.reshape(R_, S, *x.shape[1:]), out)
        return field.get_outputs(fparams, ray_samples, train=train)

    def get_loss_dict(self, params, outputs, batch, sched, rng=None) -> Dict:
        image = batch["image"]
        loss_dict = {
            "rgb_loss_coarse": jnp.mean((image - outputs["rgb_coarse"]) ** 2),
            "rgb_loss_fine": jnp.mean((image - outputs["rgb_fine"]) ** 2),
        }
        return self.scale_losses(loss_dict)


@dataclasses.dataclass(frozen=True)
class MipNerfModelConfig(VanillaModelConfig):
    num_coarse_samples: int = 128
    num_importance_samples: int = 128
    loss_coefficients: tuple = (("rgb_loss_coarse", 0.1), ("rgb_loss_fine", 1.0))


class MipNerfModel(NeRFModel):
    """mip-NeRF: one shared field with integrated positional encoding
    (reference models/mipnerf.py)."""

    config: MipNerfModelConfig
    use_integrated_encoding = True
    share_field = True
