"""VolSDF error-bounded sampler (Algorithm 1).

Functional spec: reference nerfstudio/model_components/ray_samplers.py:581-788.
TPU adaptation: the data-dependent convergence loop (`beta.max() > beta0`)
becomes a static unroll of ``max_total_iters`` upsampling rounds — the
reference's early exit is purely a compute saver and its cap is already
static (max_total_iters=5, beta_iters=10, ray_samplers.py:591,600), so the
static version is a superset in sampling quality. The per-round bisection
line-search on beta is branch-free ``jnp.where`` updates.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from sdfstudio_tpu.core.rays import RayBundle, RaySamples
from sdfstudio_tpu.utils import checks
from sdfstudio_tpu.ops.render import weights_and_transmittance_from_densities
from sdfstudio_tpu.samplers.pdf import merge_ray_samples, pdf_sampler
from sdfstudio_tpu.samplers.spaced import uniform_sampler


def _get_dstar(sdf: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Theorem-1 distance bound d* from consecutive |sdf| triangle geometry
    (reference ray_samplers.py:704-726). sdf [R, S], deltas [R, S] -> [R, S]."""
    a = deltas[..., :-1]
    b = jnp.abs(sdf[..., :-1])
    c = jnp.abs(sdf[..., 1:])
    first_cond = a**2 + b**2 <= c**2
    second_cond = a**2 + c**2 <= b**2
    s = (a + b + c) / 2.0
    area_sq = jnp.maximum(s * (s - a) * (s - b) * (s - c), 0.0)
    heron = 2.0 * jnp.sqrt(area_sq) / jnp.maximum(a, 1e-12)
    d_star = jnp.zeros_like(a)
    d_star = jnp.where(first_cond, b, d_star)
    d_star = jnp.where(second_cond, c, d_star)
    mask = (~first_cond) & (~second_cond) & (b + c - a > 0)
    d_star = jnp.where(mask, heron, d_star)
    # zero out intervals whose endpoints straddle the surface
    same_sign = jnp.sign(sdf[..., 1:]) * jnp.sign(sdf[..., :-1]) == 1
    d_star = jnp.where(same_sign, d_star, 0.0)
    return jnp.concatenate([d_star, d_star[..., -1:]], axis=-1)


def _error_bound(
    beta: jnp.ndarray,  # [R, 1]
    density_fn: Callable,
    sdf: jnp.ndarray,  # [R, S]
    d_star: jnp.ndarray,  # [R, S]
    deltas: jnp.ndarray,  # [R, S]
) -> jnp.ndarray:
    """Max per-ray opacity error bound (reference ray_samplers.py:740-756)."""
    densities = density_fn(sdf, beta)
    delta_density = deltas * densities
    integral = jnp.cumsum(delta_density[..., :-1], axis=-1)
    integral = jnp.concatenate([jnp.zeros_like(integral[..., :1]), integral], axis=-1)
    error_per_section = jnp.exp(-d_star / beta) * (deltas**2) / (4 * beta**2)
    error_integral = jnp.cumsum(error_per_section, axis=-1)
    bound_opacity = (jnp.clip(jnp.exp(error_integral), None, 1e6) - 1.0) * jnp.exp(-integral)
    return jnp.max(bound_opacity, axis=-1)  # [R]


def _updated_beta(
    beta0: jnp.ndarray,
    beta: jnp.ndarray,  # [R]
    density_fn: Callable,
    sdf: jnp.ndarray,
    d_star: jnp.ndarray,
    deltas: jnp.ndarray,
    eps: float,
    beta_iters: int,
) -> jnp.ndarray:
    """Bisection line-search for the smallest beta meeting the error bound
    (reference ray_samplers.py:728-738)."""
    curr_error = _error_bound(beta[:, None], density_fn, sdf, d_star, deltas)
    beta = jnp.where(curr_error <= eps, beta0, beta)
    beta_min = jnp.full_like(beta, beta0)
    beta_max = beta
    for _ in range(beta_iters):
        beta_mid = (beta_min + beta_max) / 2.0
        err = _error_bound(beta_mid[:, None], density_fn, sdf, d_star, deltas)
        ok = err <= eps
        beta_max = jnp.where(ok, beta_mid, beta_max)
        beta_min = jnp.where(ok, beta_min, beta_mid)
    return beta_max


def error_bounded_sampler(
    ray_bundle: RayBundle,
    density_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],  # (sdf, beta)->density
    sdf_fn: Callable[[RaySamples], jnp.ndarray],  # samples -> [R, S] sdf
    beta0: jnp.ndarray,  # scalar current learnable beta (detached)
    rng: Optional[jax.Array] = None,
    num_samples: int = 64,
    num_samples_eval: int = 128,
    num_samples_extra: int = 32,
    eps: float = 0.1,
    beta_iters: int = 10,
    max_total_iters: int = 5,
    single_jitter: bool = False,
    return_eikonal_points: bool = True,
) -> Tuple[RaySamples, Optional[jnp.ndarray]]:
    """VolSDF Algorithm-1 sampling (reference ray_samplers.py:613-702).

    Returns (ray_samples, eikonal_points [R*10, 3] or None).
    """
    checks.check_ray_bundle(ray_bundle)
    n_rngs = max_total_iters + 3
    rngs = (
        list(jax.random.split(rng, n_rngs)) if rng is not None else [None] * n_rngs
    )
    beta0 = jax.lax.stop_gradient(beta0)

    ray_samples = uniform_sampler(
        ray_bundle, num_samples_eval, rng=rngs[0], single_jitter=single_jitter
    )

    # Lemma-2 upper bound initialization (ray_samplers.py:629-633)
    deltas = ray_samples.deltas
    bound = (1.0 / (4.0 * jnp.log(jnp.asarray(eps + 1.0)))) * jnp.sum(deltas**2, axis=-1)
    beta = jnp.sqrt(bound)  # [R]

    sdf = None
    sorted_index = None
    new_samples = ray_samples
    weights = None

    for it in range(max_total_iters):
        new_sdf = jax.lax.stop_gradient(sdf_fn(new_samples))
        if sorted_index is not None:
            sdf_merge = jnp.concatenate([sdf, new_sdf], axis=-1)
            sdf = jnp.take_along_axis(sdf_merge, sorted_index, axis=-1)
        else:
            sdf = new_sdf

        deltas = ray_samples.deltas
        d_star = _get_dstar(sdf, deltas)
        beta = _updated_beta(beta0, beta, density_fn, sdf, d_star, deltas, eps, beta_iters)

        density = density_fn(sdf, beta[:, None])
        weights, transmittance = weights_and_transmittance_from_densities(deltas, density)

        if it < max_total_iters - 1:
            # upsample proportional to the current error bound
            error_per_section = jnp.exp(-d_star / beta[:, None]) * (deltas**2) / (
                4 * beta[:, None] ** 2
            )
            error_integral = jnp.cumsum(error_per_section, axis=-1)
            up_weights = (jnp.clip(jnp.exp(error_integral), None, 1e6) - 1.0) * transmittance

            new_samples = pdf_sampler(
                ray_bundle,
                ray_samples,
                up_weights,
                num_samples=num_samples_eval,
                rng=rngs[it + 1],
                single_jitter=single_jitter,
                histogram_padding=1e-5,
                include_original=False,
            )
            ray_samples, sorted_index = merge_ray_samples(ray_bundle, ray_samples, new_samples)

    # final sample set for the rendering integral
    ray_samples = pdf_sampler(
        ray_bundle,
        ray_samples,
        weights,
        num_samples=num_samples,
        rng=rngs[max_total_iters],
        single_jitter=single_jitter,
        histogram_padding=1e-5,
        include_original=False,
    )

    eik_points = None
    if return_eikonal_points:
        pts = ray_samples.get_positions().reshape(-1, 3)
        num = ray_samples.num_rays * 10
        if rng is not None:
            idx = jax.random.randint(rngs[max_total_iters + 1], (num,), 0, pts.shape[0])
        else:
            idx = jnp.arange(num) % pts.shape[0]
        eik_points = jnp.take(pts, idx, axis=0)

    if num_samples_extra > 0:
        extra = uniform_sampler(
            ray_bundle, num_samples_extra, rng=rngs[max_total_iters + 2], single_jitter=single_jitter
        )
        ray_samples, _ = merge_ray_samples(ray_bundle, ray_samples, extra)

    return ray_samples, eik_points
