"""Scene colliders: set per-ray near/far bounds.

Functional spec: reference nerfstudio/model_components/scene_colliders.py:29-163.
Pure functions over RayBundle (no mutation — return an updated pytree).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from sdfstudio_tpu.core.rays import RayBundle
from sdfstudio_tpu.core.scene_box import SceneBox


def near_far_collider(ray_bundle: RayBundle, near_plane: float, far_plane: float) -> RayBundle:
    """Constant near/far (reference scene_colliders.py:111-129)."""
    ones = jnp.ones_like(ray_bundle.origins[..., 0:1])
    return ray_bundle.replace(nears=ones * near_plane, fars=ones * far_plane)


def aabb_box_collider(
    ray_bundle: RayBundle,
    aabb: jnp.ndarray,  # [2, 3]
    near_plane: float = 0.0,
    training: bool = True,
) -> RayBundle:
    """Slab-test ray/AABB intersection (reference scene_colliders.py:47-108)."""
    rays_o, rays_d = ray_bundle.origins, ray_bundle.directions
    dir_fraction = 1.0 / (rays_d + 1e-6)
    t_lo = (aabb[0] - rays_o) * dir_fraction  # [R, 3]
    t_hi = (aabb[1] - rays_o) * dir_fraction
    nears = jnp.max(jnp.minimum(t_lo, t_hi), axis=-1)
    fars = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1)
    nears = jnp.maximum(nears, near_plane if training else 0.0)
    fars = jnp.maximum(fars, nears + 1e-6)
    return ray_bundle.replace(nears=nears[..., None], fars=fars[..., None])


def sphere_collider(
    ray_bundle: RayBundle, radius: float = 1.0, soft_intersection: bool = False
) -> RayBundle:
    """Ray/sphere quadratic intersection with a clamped fallback
    (reference scene_colliders.py:132-163)."""
    rays_o, rays_d = ray_bundle.origins, ray_bundle.directions
    ray_cam_dot = jnp.sum(rays_d * rays_o, axis=-1, keepdims=True)
    under_sqrt = ray_cam_dot**2 - (
        jnp.sum(rays_o**2, axis=-1, keepdims=True) - radius**2
    )
    under_sqrt = jnp.maximum(under_sqrt, 0.01)
    if soft_intersection:
        under_sqrt = jnp.ones_like(under_sqrt) * radius
    sqrt_val = jnp.sqrt(under_sqrt)
    nears = jnp.maximum(-sqrt_val - ray_cam_dot, 0.01)
    fars = jnp.maximum(sqrt_val - ray_cam_dot, 0.01)
    return ray_bundle.replace(nears=nears, fars=fars)


def apply_collider(
    ray_bundle: RayBundle,
    scene_box: Optional[SceneBox],
    collider_type: str,
    near_plane: float = 0.0,
    far_plane: float = 6.0,
    radius: float = 1.0,
    soft_intersection: bool = False,
    training: bool = True,
) -> RayBundle:
    """Dispatch on scene_box.collider_type (reference base_surface_model.py:166-178)."""
    if ray_bundle.nears is not None and ray_bundle.fars is not None:
        return ray_bundle
    if collider_type == "near_far":
        return near_far_collider(ray_bundle, near_plane, far_plane)
    if collider_type == "box":
        aabb = jnp.asarray(scene_box.aabb)
        return aabb_box_collider(ray_bundle, aabb, near_plane=near_plane, training=training)
    if collider_type == "sphere":
        return sphere_collider(ray_bundle, radius=radius, soft_intersection=soft_intersection)
    raise ValueError(f"unknown collider type {collider_type}")
