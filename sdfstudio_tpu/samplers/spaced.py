"""Spacing-function samplers (uniform / lin-disp / sqrt / log / piecewise).

Functional spec: reference nerfstudio/model_components/ray_samplers.py:55-247.
Pure functions: randomness comes from an explicit ``rng`` (None = eval mode,
no jitter), matching ``train_stratified and self.training``.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from sdfstudio_tpu.core.rays import (
    SPACING_LINDISP,
    SPACING_LOG,
    SPACING_PIECEWISE,
    SPACING_SQRT,
    SPACING_UNIFORM,
    RayBundle,
    RaySamples,
    spacing_fn,
)
from sdfstudio_tpu.utils import checks


def spaced_sampler(
    ray_bundle: RayBundle,
    num_samples: int,
    kind: str = SPACING_UNIFORM,
    rng: Optional[jax.Array] = None,
    single_jitter: bool = False,
) -> RaySamples:
    """Generate stratified samples under a spacing warp
    (reference ray_samplers.py:80-127)."""
    checks.check_ray_bundle(ray_bundle)
    num_rays = ray_bundle.origins.shape[0]
    bins = jnp.linspace(0.0, 1.0, num_samples + 1)[None, :]  # [1, S+1]

    if rng is not None:
        if single_jitter:
            t_rand = jax.random.uniform(rng, (num_rays, 1))
        else:
            t_rand = jax.random.uniform(rng, (num_rays, num_samples + 1))
        bin_centers = (bins[..., 1:] + bins[..., :-1]) / 2.0
        bin_upper = jnp.concatenate([bin_centers, bins[..., -1:]], axis=-1)
        bin_lower = jnp.concatenate([bins[..., :1], bin_centers], axis=-1)
        bins = bin_lower + (bin_upper - bin_lower) * t_rand  # [R, S+1]
    else:
        bins = jnp.broadcast_to(bins, (num_rays, num_samples + 1))

    s_near = spacing_fn(kind, ray_bundle.nears)  # [R, 1]
    s_far = spacing_fn(kind, ray_bundle.fars)
    euclidean_bins = _spacing_to_euclidean(kind, bins, s_near, s_far)

    return ray_bundle.get_ray_samples(
        euclidean_bins=euclidean_bins,
        spacing_bins=bins,
        spacing_kind=kind,
        s_near=s_near,
        s_far=s_far,
    )


def _spacing_to_euclidean(kind, x, s_near, s_far):
    from sdfstudio_tpu.core.rays import spacing_fn_inv

    return spacing_fn_inv(kind, x * s_far + (1.0 - x) * s_near)


def uniform_sampler(ray_bundle, num_samples, rng=None, single_jitter=False):
    return spaced_sampler(ray_bundle, num_samples, SPACING_UNIFORM, rng, single_jitter)


def linear_disparity_sampler(ray_bundle, num_samples, rng=None, single_jitter=False):
    return spaced_sampler(ray_bundle, num_samples, SPACING_LINDISP, rng, single_jitter)


def sqrt_sampler(ray_bundle, num_samples, rng=None, single_jitter=False):
    return spaced_sampler(ray_bundle, num_samples, SPACING_SQRT, rng, single_jitter)


def log_sampler(ray_bundle, num_samples, rng=None, single_jitter=False):
    return spaced_sampler(ray_bundle, num_samples, SPACING_LOG, rng, single_jitter)


def uniform_lindisp_piecewise_sampler(ray_bundle, num_samples, rng=None, single_jitter=False):
    return spaced_sampler(ray_bundle, num_samples, SPACING_PIECEWISE, rng, single_jitter)
