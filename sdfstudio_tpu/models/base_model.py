"""Generic (density) model base.

Functional spec: reference nerfstudio/models/base_model.py:40-215. Same
functional conventions as SurfaceModel: params-explicit methods + pure
schedule dicts.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from sdfstudio_tpu.components.colliders import near_far_collider
from sdfstudio_tpu.core.rays import RayBundle
from sdfstudio_tpu.core.scene_box import SceneBox


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Reference ModelConfig (base_model.py:40-52)."""

    enable_collider: bool = True
    collider_near: float = 2.0
    collider_far: float = 6.0
    loss_coefficients: Tuple[Tuple[str, float], ...] = (
        ("rgb_loss_coarse", 1.0),
        ("rgb_loss_fine", 1.0),
    )
    eval_num_rays_per_chunk: int = 4096


class Model:
    config: ModelConfig

    def __init__(self, config, scene_box: SceneBox, num_train_data: int):
        self.config = config
        self.scene_box = scene_box
        self.num_train_data = num_train_data

    def init(self, rng: jax.Array) -> Dict[str, Any]:
        raise NotImplementedError

    def schedules(self, step: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return {}

    def apply_collider(self, ray_bundle: RayBundle, train: bool = True) -> RayBundle:
        if self.config.enable_collider:
            return near_far_collider(
                ray_bundle, self.config.collider_near, self.config.collider_far
            )
        return ray_bundle

    def get_outputs(self, params, ray_bundle, rng=None, sched=None, train=True) -> Dict:
        raise NotImplementedError

    def get_loss_dict(self, params, outputs, batch, sched, rng=None) -> Dict:
        raise NotImplementedError

    def get_metrics_dict(self, params, outputs, batch) -> Dict:
        key = "rgb" if "rgb" in outputs else "rgb_fine"
        mse = jnp.mean((outputs[key] - batch["image"]) ** 2)
        return {"psnr": -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))}

    def scale_losses(self, loss_dict: Dict) -> Dict:
        coeffs = dict(self.config.loss_coefficients)
        return {k: v * coeffs.get(k, 1.0) for k, v in loss_dict.items()}
