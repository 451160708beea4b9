"""NeuS hierarchical sampler.

Functional spec: reference nerfstudio/model_components/ray_samplers.py:815-944.
Uniform init (64) then ``num_upsample_steps`` rounds of importance sampling
with a doubling fixed inv_s; each round evaluates the SDF only at the NEW
samples and merges cached values through the sort permutation. All shapes
are static (the reference's while-loop has a static trip count), so the
rounds simply unroll into one XLA program.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from sdfstudio_tpu.core.rays import RayBundle, RaySamples
from sdfstudio_tpu.utils import checks
from sdfstudio_tpu.ops.density import neus_alpha_fixed_inv_s
from sdfstudio_tpu.ops.render import weights_from_alphas
from sdfstudio_tpu.samplers.pdf import merge_ray_samples, pdf_sampler
from sdfstudio_tpu.samplers.spaced import uniform_sampler


def neus_sampler(
    ray_bundle: RayBundle,
    sdf_fn: Callable[[RaySamples], jnp.ndarray],  # [R, S] sdf at bin starts
    rng: Optional[jax.Array] = None,
    num_samples: int = 64,
    num_samples_importance: int = 64,
    num_upsample_steps: int = 4,
    base_variance: float = 64.0,
    single_jitter: bool = True,
    initial_samples: Optional[RaySamples] = None,
) -> RaySamples:
    """Generate NeuS samples (reference ray_samplers.py:847-907).

    ``sdf_fn`` must already stop gradients (the reference evaluates under
    torch.no_grad)."""
    checks.check_ray_bundle(ray_bundle)
    rngs = (
        list(jax.random.split(rng, num_upsample_steps + 1))
        if rng is not None
        else [None] * (num_upsample_steps + 1)
    )
    ray_samples = (
        initial_samples
        if initial_samples is not None
        else uniform_sampler(ray_bundle, num_samples, rng=rngs[0], single_jitter=single_jitter)
    )

    sdf = None
    sorted_index = None
    new_samples = ray_samples
    for it in range(num_upsample_steps):
        new_sdf = jax.lax.stop_gradient(sdf_fn(new_samples))
        if sorted_index is not None:
            sdf_merge = jnp.concatenate([sdf, new_sdf], axis=-1)
            sdf = jnp.take_along_axis(sdf_merge, sorted_index, axis=-1)
        else:
            sdf = new_sdf

        alphas = neus_alpha_fixed_inv_s(
            sdf, ray_samples.deltas[..., :-1], inv_s=base_variance * 2**it
        )  # [R, S-1]
        weights = weights_from_alphas(alphas)
        weights = jnp.concatenate([weights, jnp.zeros_like(weights[..., :1])], axis=-1)

        new_samples = pdf_sampler(
            ray_bundle,
            ray_samples,
            weights,
            num_samples=num_samples_importance // num_upsample_steps,
            rng=rngs[it + 1],
            single_jitter=single_jitter,
            histogram_padding=1e-5,
            include_original=False,
        )
        ray_samples, sorted_index = merge_ray_samples(ray_bundle, ray_samples, new_samples)

    return ray_samples
