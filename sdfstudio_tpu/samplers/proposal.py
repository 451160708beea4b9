"""Proposal-network sampler (mip-NeRF-360 / nerfacto / neus-facto).

Functional spec: reference nerfstudio/model_components/ray_samplers.py:497-578.
The stateful step/update-schedule bookkeeping becomes two traced scalars:
``anneal`` (weight annealing, set by the model's schedule of step) and
``train_proposal`` (whether gradients flow into the proposal density fns this
step — the reference toggles torch.no_grad via its update_sched; here a
``jnp.where(updated, w, stop_grad(w))`` selects the gradient path without
retracing).
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from sdfstudio_tpu.core.rays import RayBundle, RaySamples
from sdfstudio_tpu.utils import checks
from sdfstudio_tpu.ops.render import weights_from_densities
from sdfstudio_tpu.samplers.pdf import pdf_sampler
from sdfstudio_tpu.samplers.spaced import (
    uniform_lindisp_piecewise_sampler,
    uniform_sampler,
)


def proposal_network_sampler(
    ray_bundle: RayBundle,
    density_fns: Sequence[Callable[[jnp.ndarray], jnp.ndarray]],  # positions -> density
    rng: Optional[jax.Array] = None,
    num_proposal_samples_per_ray: Tuple[int, ...] = (64,),
    num_nerf_samples_per_ray: int = 32,
    num_proposal_network_iterations: int = 2,
    use_uniform_sampler: bool = False,
    single_jitter: bool = False,
    anneal: jnp.ndarray | float = 1.0,
    train_proposal: jnp.ndarray | bool = True,
    grad_gate: str = "cond",
) -> Tuple[RaySamples, List[jnp.ndarray], List[RaySamples]]:
    """N rounds of density evaluation + PDF resampling
    (reference ray_samplers.py:537-578). Returns
    (final samples, weights_list, ray_samples_list) for the interlevel loss."""
    checks.check_ray_bundle(ray_bundle)
    n = num_proposal_network_iterations
    assert len(density_fns) >= n
    rngs = list(jax.random.split(rng, n + 1)) if rng is not None else [None] * (n + 1)

    weights_list: List[jnp.ndarray] = []
    ray_samples_list: List[RaySamples] = []
    weights = None
    ray_samples = None
    updated = jnp.asarray(train_proposal)

    for i_level in range(n + 1):
        is_prop = i_level < n
        num_samples = (
            num_proposal_samples_per_ray[i_level] if is_prop else num_nerf_samples_per_ray
        )
        if i_level == 0:
            sampler = uniform_sampler if use_uniform_sampler else uniform_lindisp_piecewise_sampler
            ray_samples = sampler(
                ray_bundle, num_samples, rng=rngs[i_level], single_jitter=single_jitter
            )
        else:
            annealed_weights = jnp.power(weights, anneal)
            ray_samples = pdf_sampler(
                ray_bundle,
                ray_samples,
                annealed_weights,
                num_samples=num_samples,
                rng=rngs[i_level],
                single_jitter=single_jitter,
                include_original=False,
            )
        if is_prop:
            # gradient gate replacing the reference's no_grad toggle
            # (ray_samplers.py:551-570). Both forms give exactly-zero
            # proposal grads on frozen steps:
            # - "cond": backward runs only through the taken branch. Right
            #   for HASH proposal fields, whose table-gradient scatters are
            #   the expensive part and only worth paying on update steps.
            # - "where": one evaluation, cotangent masked by `updated`. The
            #   backward matmuls run every step (cheap for MLP proposal
            #   fields) but no conditional regions exist, so XLA fuses
            #   across the stage instead of materializing the activations
            #   at region boundaries (~0.4 GB/step of copies measured).
            fn = density_fns[i_level]
            positions = ray_samples.get_positions()
            if grad_gate == "where":
                d = fn(positions)
                density = jnp.where(updated, d, jax.lax.stop_gradient(d))
            else:
                density = jax.lax.cond(
                    updated,
                    lambda p: fn(p),
                    lambda p: jax.lax.stop_gradient(fn(p)),
                    positions,
                )
            weights = weights_from_densities(ray_samples.deltas, density)
            weights_list.append(weights)
            ray_samples_list.append(ray_samples)

    return ray_samples, weights_list, ray_samples_list
