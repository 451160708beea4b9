"""Inverse-CDF (PDF) importance sampler + sample-set merging.

Functional spec: reference nerfstudio/model_components/ray_samplers.py:250-370
(PDFSampler) and 758-788 / 1095-1130 (merge_ray_samples, euclidean merge).
Static shapes throughout: N input samples -> M output samples, known at
trace time. Inverse-CDF lookups use the branchless comparison-count
searchsorted (core/math.py::searchsorted_right) — a vmapped binary search
lowers to a serial while-loop per call site on TPU.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from sdfstudio_tpu.core.math import searchsorted_right
from sdfstudio_tpu.core.rays import RayBundle, RaySamples


def sample_pdf_bins(
    existing_bins: jnp.ndarray,  # [R, N+1] (spacing coords)
    weights: jnp.ndarray,  # [R, N]
    num_samples: int,
    rng: Optional[jax.Array] = None,
    single_jitter: bool = False,
    histogram_padding: float = 0.01,
    include_original: bool = False,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Draw ``num_samples + 1`` new bin edges from the weight histogram
    (reference ray_samplers.py:275-358). Returns [R, num_samples+1] (or
    [R, N + num_samples + 2] merged+sorted when include_original)."""
    from sdfstudio_tpu.utils import checks

    checks.check_bins_weights(existing_bins, weights, "sample_pdf_bins")
    num_bins = num_samples + 1

    weights = weights + histogram_padding
    weights_sum = jnp.sum(weights, axis=-1, keepdims=True)
    padding = jax.nn.relu(eps - weights_sum)
    weights = weights + padding / weights.shape[-1]
    weights_sum = weights_sum + padding

    pdf = weights / weights_sum
    cdf = jnp.minimum(jnp.ones_like(pdf), jnp.cumsum(pdf, axis=-1))
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [R, N+1]

    u_base = jnp.linspace(0.0, 1.0 - 1.0 / num_bins, num_bins)  # [num_bins]
    if rng is not None:
        if single_jitter:
            rand = jax.random.uniform(rng, (*cdf.shape[:-1], 1)) / num_bins
        else:
            rand = jax.random.uniform(rng, (*cdf.shape[:-1], num_bins)) / num_bins
        u = u_base + rand
    else:
        u = u_base + 1.0 / (2 * num_bins)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], num_bins))

    # branchless comparison-count form — a vmapped binary search lowers to
    # a serial while-loop on TPU (~18 ms/step at this site per the round-4
    # device trace; see core/math.py::searchsorted_right)
    inds = searchsorted_right(cdf, u)
    below = jnp.clip(inds - 1, 0, existing_bins.shape[-1] - 1)
    above = jnp.clip(inds, 0, existing_bins.shape[-1] - 1)
    cdf_g0 = jnp.take_along_axis(cdf, below, axis=-1)
    bins_g0 = jnp.take_along_axis(existing_bins, below, axis=-1)
    cdf_g1 = jnp.take_along_axis(cdf, above, axis=-1)
    bins_g1 = jnp.take_along_axis(existing_bins, above, axis=-1)

    t = jnp.clip(jnp.nan_to_num((u - cdf_g0) / (cdf_g1 - cdf_g0), nan=0.0), 0.0, 1.0)
    bins = bins_g0 + t * (bins_g1 - bins_g0)

    if include_original:
        bins = jnp.sort(jnp.concatenate([existing_bins, bins], axis=-1), axis=-1)

    return jax.lax.stop_gradient(bins)


def pdf_sampler(
    ray_bundle: RayBundle,
    ray_samples: RaySamples,
    weights: jnp.ndarray,  # [R, N]
    num_samples: int,
    rng: Optional[jax.Array] = None,
    single_jitter: bool = False,
    histogram_padding: float = 0.01,
    include_original: bool = True,
) -> RaySamples:
    """PDF resampling over the existing sample bins (ray_samplers.py:275-370)."""
    existing_bins = jnp.concatenate(
        [ray_samples.spacing_starts, ray_samples.spacing_ends[..., -1:]], axis=-1
    )
    bins = sample_pdf_bins(
        existing_bins,
        weights,
        num_samples,
        rng=rng,
        single_jitter=single_jitter,
        histogram_padding=histogram_padding,
        include_original=include_original,
    )
    euclidean_bins = ray_samples.spacing_to_euclidean(bins)
    return ray_bundle.get_ray_samples(
        euclidean_bins=euclidean_bins,
        spacing_bins=bins,
        spacing_kind=ray_samples.spacing_kind,
        s_near=ray_samples.s_near,
        s_far=ray_samples.s_far,
    )


def merge_ray_samples(
    ray_bundle: RayBundle,
    samples_1: RaySamples,
    samples_2: RaySamples,
) -> Tuple[RaySamples, jnp.ndarray]:
    """Merge two sample sets by sorting their spacing starts; the returned
    sorted index reorders concat([values_1, values_2]) to the merged order,
    so cached SDF evaluations can be reused (reference
    ray_samplers.py:758-788)."""
    starts_1 = samples_1.spacing_starts  # [R, S1]
    starts_2 = samples_2.spacing_starts  # [R, S2]
    ends = jnp.maximum(
        samples_1.spacing_ends[..., -1:], samples_2.spacing_ends[..., -1:]
    )
    concat = jnp.concatenate([starts_1, starts_2], axis=-1)
    sorted_index = jnp.argsort(concat, axis=-1)
    bins = jnp.take_along_axis(concat, sorted_index, axis=-1)
    bins = jax.lax.stop_gradient(jnp.concatenate([bins, ends], axis=-1))
    euclidean_bins = samples_1.spacing_to_euclidean(bins)
    merged = ray_bundle.get_ray_samples(
        euclidean_bins=euclidean_bins,
        spacing_bins=bins,
        spacing_kind=samples_1.spacing_kind,
        s_near=samples_1.s_near,
        s_far=samples_1.s_far,
    )
    return merged, sorted_index


def merge_ray_samples_in_euclidean(
    ray_bundle: RayBundle,
    samples_1: RaySamples,
    samples_2: RaySamples,
) -> RaySamples:
    """Merge two sample sets whose warps differ by sorting euclidean starts
    (reference ray_samplers.py:1095-1130, UniSurf)."""
    starts_1 = samples_1.spacing_to_euclidean(samples_1.spacing_starts)
    starts_2 = samples_2.spacing_to_euclidean(samples_2.spacing_starts)
    end_1 = samples_1.spacing_to_euclidean(samples_1.spacing_ends[..., -1:])
    end_2 = samples_2.spacing_to_euclidean(samples_2.spacing_ends[..., -1:])
    end = jnp.maximum(end_1, end_2)
    euclidean_bins = jnp.sort(jnp.concatenate([starts_1, starts_2], axis=-1), axis=-1)
    euclidean_bins = jax.lax.stop_gradient(
        jnp.concatenate([euclidean_bins, end], axis=-1)
    )
    return ray_bundle.get_ray_samples(euclidean_bins=euclidean_bins)
