"""Voxel + surface-cache guided sampling (NeuralReconW / DtoO).

Functional spec: reference NeuralReconWSampler
(nerfstudio/model_components/ray_samplers.py:1141-1312) — also inlined by
the reference DtoO model (models/dto.py:183-319):

1. tighten per-ray [near, far] against a COARSE binary grid (sparse-cloud
   occupancy from the dataparser);
2. take ``num_voxel_samples`` uniform "boundary" samples over those bounds;
3. when the FINE surface-cache grid is armed (refreshed periodically from
   sdf <= 0), collapse the bounds to a +-``fine_shell_margin`` shell around
   the first fine hit;
4. run the NeuS importance sampler (8 base + 16 importance, 2 rounds,
   base variance 512) on the (possibly shell-) bounds;
5. euclidean-merge the NeuS and voxel samples.

TPU adaptation: the nerfacc ray marches become fixed-count probe marches
(grid_near_far), so every shape is static.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax

from sdfstudio_tpu.core.rays import RayBundle, RaySamples
from sdfstudio_tpu.samplers.grid import OccupancyGrid, grid_near_far
from sdfstudio_tpu.samplers.neus import neus_sampler
from sdfstudio_tpu.samplers.pdf import merge_ray_samples_in_euclidean
from sdfstudio_tpu.samplers.spaced import uniform_sampler


def voxel_surface_guided_samples(
    ray_bundle: RayBundle,
    coarse_grid: OccupancyGrid,
    fine_grid: OccupancyGrid,
    sdf_fn: Callable[[RaySamples], "jax.Array"],
    rng: Optional[jax.Array],
    num_voxel_samples: int = 10,
    num_samples: int = 8,
    num_samples_importance: int = 16,
    num_upsample_steps: int = 2,
    base_variance: float = 512.0,
    coarse_probe_steps: int = 64,
    fine_shell_margin: float = 0.03,
) -> RaySamples:
    """Returns the merged [R, num_voxel + num_neus] ray samples."""
    if rng is not None:
        vox_rng, neus_rng = jax.random.split(rng)
    else:
        vox_rng = neus_rng = None

    # coarse near/far tightening (ray_samplers.py:1258-1276)
    nears, fars, _ = grid_near_far(ray_bundle, coarse_grid, num_probes=coarse_probe_steps)
    coarse_bundle = ray_bundle.replace(nears=nears, fars=fars)

    # uniform voxel/boundary samples over the coarse bounds (:1279)
    voxel_samples = uniform_sampler(coarse_bundle, num_voxel_samples, rng=vox_rng)

    # fine surface shell once armed (:1282-1305); a disarmed (all-empty)
    # grid hits nothing, so rays keep the coarse bounds
    f_nears, f_fars, _ = grid_near_far(
        coarse_bundle, fine_grid,
        num_probes=coarse_probe_steps,
        first_hit_shell=fine_shell_margin,
    )
    neus_bundle = ray_bundle.replace(nears=f_nears, fars=f_fars)

    # surface-guided NeuS sampling (:1307-1308)
    neus_samples = neus_sampler(
        neus_bundle,
        sdf_fn,
        rng=neus_rng,
        num_samples=num_samples,
        num_samples_importance=num_samples_importance,
        num_upsample_steps=num_upsample_steps,
        base_variance=base_variance,
    )

    # euclidean merge (:1311)
    return merge_ray_samples_in_euclidean(coarse_bundle, neus_samples, voxel_samples)
