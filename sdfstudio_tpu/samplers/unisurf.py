"""UniSurf surface-guided sampler.

Functional spec: reference nerfstudio/model_components/ray_samplers.py:947-1138.
TPU adaptation: the reference compacts surface points to the masked subset of
rays; we keep full [R] arrays plus a validity mask (static shapes), and the
root-finding uses the same sign-change cost-matrix argmin trick.
"""
from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from sdfstudio_tpu.core.rays import RayBundle, RaySamples
from sdfstudio_tpu.utils import checks
from sdfstudio_tpu.ops.render import weights_from_alphas
from sdfstudio_tpu.samplers.pdf import merge_ray_samples_in_euclidean, pdf_sampler
from sdfstudio_tpu.samplers.spaced import uniform_sampler


class SurfacePoints(NamedTuple):
    points: jnp.ndarray  # [R, 3]
    mask: jnp.ndarray  # [R] bool — valid +->- sign-change found
    depth: jnp.ndarray  # [R] root depth along ray


def unisurf_interval_delta(
    step: jnp.ndarray,
    interval_start: float = 0.25,
    interval_end: float = 0.0125,
    interval_decay: float = 5e-5,
) -> jnp.ndarray:
    """Exponentially decayed interval half-width schedule
    (reference ray_samplers.py:988-991) as a pure function of step."""
    return jnp.maximum(interval_start * jnp.exp(-interval_decay * step), interval_end)


def find_surface_points(
    ray_samples: RaySamples, sdf: jnp.ndarray
) -> SurfacePoints:
    """First +->- sign-change root via linear interpolation
    (reference ray_samplers.py:1031-1066)."""
    n_samples = sdf.shape[-1]
    starts = ray_samples.starts  # [R, S]
    sign_matrix = jnp.concatenate(
        [jnp.sign(sdf[..., :-1] * sdf[..., 1:]), jnp.ones_like(sdf[..., :1])], axis=-1
    )
    cost_matrix = sign_matrix * jnp.arange(n_samples, 0, -1, dtype=sdf.dtype)
    values = jnp.min(cost_matrix, axis=-1)
    indices = jnp.argmin(cost_matrix, axis=-1)  # [R]
    mask_sign_change = values < 0
    sdf_at = jnp.take_along_axis(sdf, indices[:, None], axis=-1)[:, 0]
    mask_pos_to_neg = sdf_at > 0
    mask = mask_sign_change & mask_pos_to_neg

    ind_hi = jnp.clip(indices + 1, None, n_samples - 1)
    d_low = jnp.take_along_axis(starts, indices[:, None], axis=-1)[:, 0]
    v_low = sdf_at
    d_high = jnp.take_along_axis(starts, ind_hi[:, None], axis=-1)[:, 0]
    v_high = jnp.take_along_axis(sdf, ind_hi[:, None], axis=-1)[:, 0]

    z = (v_low * d_high - v_high * d_low) / jnp.where(
        jnp.abs(v_low - v_high) > 1e-12, v_low - v_high, 1e-12
    )
    # keep invalid-ray roots in a sane range (they are masked downstream, but
    # runaway values would otherwise feed the field with huge positions)
    z = jnp.clip(z, starts[..., 0], starts[..., -1])
    points = ray_samples.origins + ray_samples.directions * z[:, None]
    return SurfacePoints(points=points, mask=mask, depth=z)


def unisurf_sampler(
    ray_bundle: RayBundle,
    occupancy_fn: Callable[[jnp.ndarray], jnp.ndarray],
    sdf_fn: Callable[[RaySamples], jnp.ndarray],
    delta: jnp.ndarray,  # scalar interval half-width (schedule of step)
    rng: Optional[jax.Array] = None,
    num_samples_interval: int = 64,
    num_samples_outside: int = 32,
    num_samples_importance: int = 32,
    num_marching_steps: int = 256,
    single_jitter: bool = False,
) -> Tuple[RaySamples, SurfacePoints]:
    """UniSurf sampling (reference ray_samplers.py:993-1093). Returns the
    merged samples and the surface points (with validity mask) for the
    smoothness loss."""
    checks.check_ray_bundle(ray_bundle)
    rngs = list(jax.random.split(rng, 4)) if rng is not None else [None] * 4

    ray_samples = uniform_sampler(
        ray_bundle, num_marching_steps, rng=rngs[0], single_jitter=single_jitter
    )
    sdf = jax.lax.stop_gradient(sdf_fn(ray_samples))

    # occupancy-weighted importance samples
    occupancy = occupancy_fn(sdf)
    weights = weights_from_alphas(occupancy)
    importance_samples = pdf_sampler(
        ray_bundle,
        ray_samples,
        weights,
        num_samples=num_samples_importance,
        rng=rngs[1],
        single_jitter=single_jitter,
        histogram_padding=1e-5,
        include_original=False,
    )

    outside_samples = uniform_sampler(
        ray_bundle, num_samples_outside, rng=rngs[2], single_jitter=single_jitter
    )
    uniform_importance = merge_ray_samples_in_euclidean(
        ray_bundle, importance_samples, outside_samples
    )

    surface = find_surface_points(ray_samples, sdf)

    # shrink [near, far] around the root for masked rays
    nears, fars = ray_bundle.nears, ray_bundle.fars
    dists = fars - nears
    z = surface.depth[:, None]
    m = surface.mask[:, None]
    new_nears = jnp.where(m, jnp.maximum(z - dists * delta, nears), nears)
    new_fars = jnp.where(m, jnp.minimum(z + dists * delta, fars), fars)
    shrunk_bundle = ray_bundle.replace(nears=new_nears, fars=new_fars)

    interval_samples = uniform_sampler(
        shrunk_bundle, num_samples_interval, rng=rngs[3], single_jitter=single_jitter
    )

    merged = merge_ray_samples_in_euclidean(
        ray_bundle, interval_samples, uniform_importance
    )
    return merged, surface
