"""Base surface model.

Functional spec: reference nerfstudio/models/base_surface_model.py:68-547.
Models are plain Python objects; every method that touches parameters takes
the ``params`` pytree explicitly, and schedule-driven state (cos anneal,
hash mask, grad delta, proposal anneal) arrives as a ``sched`` dict of
traced scalars computed from ``step`` inside the jitted train step — this
replaces the reference's mutate-module-state training callbacks.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from sdfstudio_tpu.components import losses as L
from sdfstudio_tpu.components.colliders import apply_collider
from sdfstudio_tpu.core.rays import RayBundle, RaySamples
from sdfstudio_tpu.core.scene_box import SceneBox
from sdfstudio_tpu.fields.nerfacto_field import NerfactoField
from sdfstudio_tpu.fields.sdf_field import SDFField, SDFFieldConfig
from sdfstudio_tpu.fields.vanilla_nerf_field import NeRFField
from sdfstudio_tpu.ops import render as R
from sdfstudio_tpu.ops.contraction import contract
from sdfstudio_tpu.samplers.spaced import linear_disparity_sampler


@dataclasses.dataclass(frozen=True)
class SurfaceModelConfig:
    """Mirror of reference SurfaceModelConfig (base_surface_model.py:68-132)."""

    near_plane: float = 0.05
    far_plane: float = 4.0
    far_plane_bg: float = 1000.0
    background_color: str = "black"
    use_average_appearance_embedding: bool = False
    eikonal_loss_mult: float = 0.1
    fg_mask_loss_mult: float = 0.01
    mono_normal_loss_mult: float = 0.0
    mono_depth_loss_mult: float = 0.0
    patch_warp_loss_mult: float = 0.0
    patch_size: int = 11
    patch_warp_angle_thres: float = 0.3
    min_patch_variance: float = 0.01
    topk: int = 4
    sensor_depth_truncation: float = 0.015
    sensor_depth_l1_loss_mult: float = 0.0
    sensor_depth_freespace_loss_mult: float = 0.0
    sensor_depth_sdf_loss_mult: float = 0.0
    sparse_points_sdf_loss_mult: float = 0.0
    s3im_loss_mult: float = 0.0
    s3im_kernel_size: int = 4
    s3im_stride: int = 4
    s3im_repeat_time: int = 10
    s3im_patch_height: int = 32
    sdf_field: SDFFieldConfig = SDFFieldConfig()
    background_model: str = "mlp"  # grid | mlp | none
    num_samples_outside: int = 32
    periodic_tvl_mult: float = 0.0
    overwrite_near_far_plane: bool = False
    scene_contraction_norm: str = "inf"  # inf | l2
    # engine-level (reference ModelConfig, base_model.py:40-52)
    eval_num_rays_per_chunk: int = 1024


class SurfaceModel:
    """Shared machinery of all surface methods."""

    config: SurfaceModelConfig

    def __init__(self, config: SurfaceModelConfig, scene_box: SceneBox, num_train_data: int):
        self.config = config
        self.scene_box = scene_box
        self.num_train_data = num_train_data

        self.field = SDFField(
            config=config.sdf_field,
            num_images=num_train_data,
            spatial_distortion=config.scene_contraction_norm,
            use_average_appearance_embedding=config.use_average_appearance_embedding,
        )

        if config.background_model == "grid":
            self.field_background = NerfactoField(
                spatial_distortion=config.scene_contraction_norm,
                num_images=num_train_data,
                use_average_appearance_embedding=config.use_average_appearance_embedding,
            )
        elif config.background_model == "mlp":
            self.field_background = NeRFField(
                spatial_distortion=config.scene_contraction_norm
            )
        else:
            self.field_background = None

    # ------------------------------------------------------------------
    def init(self, rng: jax.Array) -> Dict[str, Any]:
        k1, k2 = jax.random.split(rng)
        params = {"field": self.field.init(k1)}
        if self.field_background is not None:
            params["field_background"] = self.field_background.init(k2)
        else:
            # dummy group mirrors reference base_surface_model.py:203
            params["field_background"] = {"dummy": jnp.ones((1,))}
        return params

    def schedules(self, step: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Pure schedule values; subclasses extend."""
        return {"cos_anneal_ratio": jnp.asarray(1.0)}

    # ------------------------------------------------------------------
    def apply_collider(self, ray_bundle: RayBundle, train: bool = True) -> RayBundle:
        sb = self.scene_box
        if self.config.overwrite_near_far_plane:
            return apply_collider(
                ray_bundle, sb, "near_far", self.config.near_plane, self.config.far_plane
            )
        return apply_collider(
            ray_bundle,
            sb,
            sb.collider_type,
            near_plane=sb.near,
            far_plane=sb.far,
            radius=sb.radius,
            soft_intersection=True,
            training=train,
        )

    def contract(self, x: jnp.ndarray) -> jnp.ndarray:
        order = jnp.inf if self.config.scene_contraction_norm == "inf" else None
        return contract(x, order=order)

    def get_foreground_mask(self, ray_samples: RaySamples) -> jnp.ndarray:
        """Inside-unit-sphere mask [R, S] (base_surface_model.py:256-264)."""
        pts = ray_samples.get_start_positions()
        return (jnp.linalg.norm(pts, axis=-1) < 1.0).astype(jnp.float32)

    def forward_background_field_and_merge(
        self, params, ray_samples: RaySamples, field_outputs: Dict, train: bool
    ) -> Dict:
        """Blend fg alpha/rgb with the bg field inside/outside the unit
        sphere (base_surface_model.py:266-290)."""
        inside = self.get_foreground_mask(ray_samples)
        bg = self.field_background.get_outputs(
            params["field_background"], ray_samples, train=train
        )
        bg_alpha = R.alphas_from_densities(ray_samples.deltas, bg["density"])
        field_outputs = dict(field_outputs)
        field_outputs["alpha"] = field_outputs["alpha"] * inside + (1.0 - inside) * bg_alpha
        field_outputs["rgb"] = (
            field_outputs["rgb"] * inside[..., None]
            + (1.0 - inside[..., None]) * bg["rgb"]
        )
        return field_outputs

    # ------------------------------------------------------------------
    def sample_and_forward_field(
        self, params, ray_bundle: RayBundle, rng, sched: Dict, train: bool
    ) -> Dict:
        raise NotImplementedError

    def get_outputs(
        self,
        params,
        ray_bundle: RayBundle,
        rng: Optional[jax.Array] = None,
        sched: Optional[Dict] = None,
        train: bool = True,
        model_state=None,
    ) -> Dict:
        """Full model forward (reference base_surface_model.py:292-365)."""
        sched = sched or self.schedules(jnp.asarray(1_000_000))
        ray_bundle = self.apply_collider(ray_bundle, train=train)
        if rng is not None:
            rng, bg_rng = jax.random.split(rng)
        else:
            bg_rng = None
        if getattr(self, "has_model_state", False):
            s = self.sample_and_forward_field(
                params, ray_bundle, rng, sched, train, model_state=model_state
            )
        else:
            s = self.sample_and_forward_field(params, ray_bundle, rng, sched, train)

        field_outputs = s["field_outputs"]
        ray_samples: RaySamples = s["ray_samples"]
        weights = s["weights"]

        rgb = R.render_rgb(
            field_outputs["rgb"], weights, background_color=self.config.background_color
        )
        depth = R.render_depth_expected(weights, ray_samples.starts, ray_samples.ends)
        if ray_bundle.directions_norm is not None:
            depth = depth / ray_bundle.directions_norm
        normal = R.render_semantics(field_outputs["normal"], weights)
        accumulation = R.render_accumulation(weights)

        if self.field_background is not None and "bg_transmittance" in s:
            bg_transmittance = s["bg_transmittance"]  # [R, 1]
            bg_bundle = ray_bundle.replace(
                nears=ray_bundle.fars,
                fars=jnp.ones_like(ray_bundle.fars) * self.config.far_plane_bg,
            )
            bg_samples = linear_disparity_sampler(
                bg_bundle, self.config.num_samples_outside, rng=bg_rng
            )
            bg_out = self.field_background.get_outputs(
                params["field_background"], bg_samples, train=train
            )
            bg_weights = R.weights_from_densities(bg_samples.deltas, bg_out["density"])
            rgb_bg = R.render_rgb(
                bg_out["rgb"], bg_weights, background_color=self.config.background_color
            )
            rgb = rgb + bg_transmittance * rgb_bg

        outputs = {
            "rgb": rgb,
            "accumulation": accumulation,
            "depth": depth,
            "normal": normal,
            "weights": weights,
            "ray_points": self.contract(ray_samples.get_start_positions()),
            "directions_norm": ray_bundle.directions_norm,
            "normal_vis": (normal + 1.0) / 2.0,
        }

        if train:
            outputs["eik_grad"] = field_outputs["gradient"]
            outputs["points_norm"] = field_outputs["points_norm"]
            outputs.update(s)
        elif "num_samples_per_ray" in s:
            # grid-based models report occupancy stats at eval too (dynamic
            # batch sizing reads this)
            outputs["num_samples_per_ray"] = s["num_samples_per_ray"]

        if "weights_list" in s:
            for i in range(len(s["weights_list"]) - 1):
                ws = s["weights_list"][i]
                rs = s["ray_samples_list"][i]
                outputs[f"prop_depth_{i}"] = R.render_depth_expected(ws, rs.starts, rs.ends)

        return outputs

    # ------------------------------------------------------------------
    def get_outputs_flexible(
        self,
        params,
        ray_bundle: RayBundle,
        additional_inputs: Dict,
        rng: Optional[jax.Array] = None,
        sched: Optional[Dict] = None,
        train: bool = True,
        model_state=None,
    ) -> Dict:
        """get_outputs + Geo-NeuS patch warping from source views
        (reference base_surface_model.py:367-397)."""
        outputs = self.get_outputs(
            params, ray_bundle, rng=rng, sched=sched, train=train, model_state=model_state
        )
        if self.config.patch_warp_loss_mult > 0 and "field_outputs" in outputs:
            from sdfstudio_tpu.components.patch_warping import patch_warping

            patches, valid = patch_warping(
                outputs["ray_samples"],
                outputs["field_outputs"]["sdf"],
                outputs["field_outputs"]["normal"],
                additional_inputs["src_cameras"],
                additional_inputs["src_imgs"],
                additional_inputs["uv"],
                patch_size=self.config.patch_size,
                valid_angle_thres=self.config.patch_warp_angle_thres,
            )
            outputs["patches"] = patches
            outputs["patches_valid_mask"] = valid
        return outputs

    # ------------------------------------------------------------------
    def get_loss_dict(
        self,
        params,
        outputs: Dict,
        batch: Dict,
        sched: Dict,
        rng: Optional[jax.Array] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Training losses (reference base_surface_model.py:399-473)."""
        cfg = self.config
        loss_dict: Dict[str, jnp.ndarray] = {}
        image = batch["image"]
        loss_dict["rgb_loss"] = L.l1_loss(image, outputs["rgb"])

        loss_dict["eikonal_loss"] = (
            L.eikonal_loss(outputs["eik_grad"]) * cfg.eikonal_loss_mult
        )

        if cfg.s3im_loss_mult > 0 and rng is not None:
            loss_dict["s3im_loss"] = (
                L.s3im_loss(
                    outputs["rgb"],
                    image,
                    rng,
                    kernel_size=cfg.s3im_kernel_size,
                    stride=cfg.s3im_stride,
                    repeat_time=cfg.s3im_repeat_time,
                    patch_height=cfg.s3im_patch_height,
                )
                * cfg.s3im_loss_mult
            )

        if "fg_mask" in batch and cfg.fg_mask_loss_mult > 0.0:
            fg_label = batch["fg_mask"].astype(jnp.float32)
            weights_sum = jnp.clip(jnp.sum(outputs["weights"], axis=-1, keepdims=True), 1e-3, 1 - 1e-3)
            loss_dict["fg_mask_loss"] = (
                L.binary_cross_entropy(weights_sum, fg_label) * cfg.fg_mask_loss_mult
            )

        if "normal" in batch and cfg.mono_normal_loss_mult > 0.0:
            loss_dict["normal_loss"] = (
                L.monosdf_normal_loss(outputs["normal"], batch["normal"])
                * cfg.mono_normal_loss_mult
            )

        if "depth" in batch and cfg.mono_depth_loss_mult > 0.0:
            # hard-coded x50+0.5 scaling per reference base_surface_model.py:435.
            # The reference reshapes the ray batch to a (1, 32, -1) pseudo-image
            # (the scale/shift solve sums over axes (1, 2), so it is per-batch
            # either way); rays are padded with mask=0 entries so any batch
            # size works — padded entries contribute nothing to the solve or
            # the gradient-matching term.
            depth_gt = (batch["depth"].reshape(-1) * 50 + 0.5)
            depth_pred = outputs["depth"].reshape(-1)
            n = depth_pred.shape[0]
            rows = 32 if n >= 32 else n
            pad = (-n) % rows
            mask = jnp.pad(jnp.ones((n,), depth_pred.dtype), (0, pad))
            depth_gt = jnp.pad(depth_gt, (0, pad))
            depth_pred = jnp.pad(depth_pred, (0, pad))
            loss_dict["depth_loss"] = (
                L.scale_and_shift_invariant_loss(
                    depth_pred.reshape(1, rows, -1),
                    depth_gt.reshape(1, rows, -1),
                    mask.reshape(1, rows, -1),
                    alpha=0.5,
                    scales=1,
                )
                * cfg.mono_depth_loss_mult
            )

        if "sensor_depth" in batch and (
            cfg.sensor_depth_l1_loss_mult > 0.0
            or cfg.sensor_depth_freespace_loss_mult > 0.0
            or cfg.sensor_depth_sdf_loss_mult > 0.0
        ):
            l1, free_space, sdf_l = L.sensor_depth_loss(
                outputs["depth"],
                batch["sensor_depth"][..., None],
                outputs["ray_samples"].starts,
                outputs["field_outputs"]["sdf"],
                outputs["directions_norm"],
                truncation=cfg.sensor_depth_truncation,
            )
            loss_dict["sensor_l1_loss"] = l1 * cfg.sensor_depth_l1_loss_mult
            loss_dict["sensor_freespace_loss"] = free_space * cfg.sensor_depth_freespace_loss_mult
            loss_dict["sensor_sdf_loss"] = sdf_l * cfg.sensor_depth_sdf_loss_mult

        if "patches" in outputs and cfg.patch_warp_loss_mult > 0.0:
            loss_dict["patch_loss"] = (
                L.multi_view_loss(
                    outputs["patches"],
                    outputs["patches_valid_mask"],
                    patch_size=cfg.patch_size,
                    topk=cfg.topk,
                    min_patch_variance=cfg.min_patch_variance,
                )
                * cfg.patch_warp_loss_mult
            )

        if "sparse_sfm_points" in batch and cfg.sparse_points_sdf_loss_mult > 0.0:
            pts = batch["sparse_sfm_points"]
            sdf = self.field.sdf_fn(params["field"], sched.get("hash_mask"))(pts)
            loss_dict["sparse_sfm_points_sdf_loss"] = (
                jnp.mean(jnp.abs(sdf)) * cfg.sparse_points_sdf_loss_mult
            )

        if cfg.periodic_tvl_mult > 0.0:
            assert self.field.config.encoding_type == "periodic"
            tv = self.field.module.encoding.total_variation_loss(
                params["field"]["encoding"]["hash_table"]
            )
            loss_dict["tvl_loss"] = tv * cfg.periodic_tvl_mult

        return loss_dict

    def get_metrics_dict(self, params, outputs: Dict, batch: Dict) -> Dict:
        mse = jnp.mean((outputs["rgb"] - batch["image"]) ** 2)
        psnr = -10.0 * jnp.log10(mse)
        return {"psnr": psnr}
