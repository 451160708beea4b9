"""Visibility mask for unbounded mesh extraction.

Functional spec: reference nerfstudio/pipelines/base_pipeline.py:370-424
(get_visibility_mask): render all training views and splat ray-sample
positions with weight above a threshold into a coarse grid over the
contracted [-2, 2]^3 space; marching cubes then only keeps observed space.
The reference splats through grid_sample's backward; here it is a direct
jitted scatter-max.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def compute_visibility_mask(
    trainer,
    resolution: int = 128,
    weight_threshold: float = 0.005,
    rays_per_image: int = 4096,
    bound: float = 2.0,
) -> np.ndarray:
    """Returns a bool [res, res, res] grid over contracted space."""
    dm = trainer.datamanager
    model = trainer.model
    params = trainer.state.params
    res = resolution

    @jax.jit
    def splat(grid, ray_indices):
        ray_bundle = dm.generate_rays(None, ray_indices, train=False)
        sched = model.schedules(trainer.state.step.astype(jnp.float32))
        outputs = model.get_outputs(params, ray_bundle, rng=None, sched=sched, train=False)
        pts = outputs["ray_points"].reshape(-1, 3)  # contracted positions
        w = outputs["weights"].reshape(-1)
        frac = (pts + bound) / (2 * bound)
        ijk = jnp.clip((frac * res).astype(jnp.int32), 0, res - 1)
        flat = ijk[:, 0] * res * res + ijk[:, 1] * res + ijk[:, 2]
        contrib = (w > weight_threshold).astype(jnp.float32)
        return grid.at[flat].max(contrib)

    grid = jnp.zeros((res**3,), jnp.float32)
    H, W = dm.image_height, dm.image_width
    rng = jax.random.PRNGKey(0)
    for cam_idx in range(dm.num_train_images):
        rng, ky, kx = jax.random.split(rng, 3)
        y = jax.random.randint(ky, (rays_per_image,), 0, H)
        x = jax.random.randint(kx, (rays_per_image,), 0, W)
        cam = jnp.full((rays_per_image,), cam_idx, jnp.int32)
        grid = splat(grid, jnp.stack([cam, y, x], axis=-1))
    vis = np.asarray(grid).reshape(res, res, res) > 0.5
    # min-pool style dilation to remove isolated holes
    # (reference marching_cubes.py:290-292 min-pools to kill artifacts)
    dil = vis.copy()
    for ax in range(3):
        dil |= np.roll(vis, 1, axis=ax) | np.roll(vis, -1, axis=ax)
    return dil


def visibility_mask_fn(mask: np.ndarray, bound: float = 2.0) -> Callable:
    """Wrap a host grid as a jnp lookup usable inside the MC sdf query."""
    grid = jnp.asarray(mask.astype(np.float32))
    res = mask.shape[0]

    def fn(pts):
        frac = (pts + bound) / (2 * bound)
        ijk = jnp.clip((frac * res).astype(jnp.int32), 0, res - 1)
        return grid[ijk[..., 0], ijk[..., 1], ijk[..., 2]]

    return fn
