"""Unit tests for voxel + surface-cache guided sampling.

Reference behavior: NeuralReconWSampler
(nerfstudio/model_components/ray_samplers.py:1141-1312) — coarse-grid
near/far tightening, fine surface-shell collapse once the cache is armed,
euclidean merge of NeuS + boundary samples.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from sdfstudio_tpu.core.rays import RayBundle
from sdfstudio_tpu.samplers.grid import OccupancyGrid, grid_near_far
from sdfstudio_tpu.samplers.surface_guided import voxel_surface_guided_samples

AABB = np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]], np.float32)


def _rays(n=4):
    origins = jnp.tile(jnp.array([[-2.0, 0.0, 0.0]]), (n, 1))
    dirs = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (n, 1))
    return RayBundle(
        origins=origins,
        directions=dirs,
        pixel_area=jnp.ones((n, 1)),
        nears=jnp.full((n, 1), 0.05),
        fars=jnp.full((n, 1), 4.0),
        camera_indices=jnp.zeros((n, 1), jnp.int32),
    )


def _slab_grid(res=32, x_lo=-0.2, x_hi=0.2):
    """Grid occupied only in an x-slab (a wall at x≈0)."""
    grid = OccupancyGrid.create(AABB, resolution=res)
    centers = (np.arange(res) + 0.5) / res * 2.0 - 1.0
    occ_x = (centers > x_lo) & (centers < x_hi)
    binary = np.zeros((res, res, res), bool)
    binary[occ_x] = True
    return grid.replace(binary=jnp.asarray(binary))


def _sphere_sdf(samples):
    pts = samples.get_start_positions()
    return jnp.linalg.norm(pts, axis=-1, keepdims=False).reshape(
        samples.starts.shape
    ) - 0.5


def test_grid_near_far_tightens_to_slab():
    rb = _rays()
    nears, fars, hit = grid_near_far(rb, _slab_grid(), num_probes=256)
    # wall at x in [-0.2, 0.2]; ray from x=-2 → t in [1.8, 2.2]
    assert bool(jnp.all(hit))
    assert float(jnp.max(jnp.abs(nears - 1.8))) < 0.05
    assert float(jnp.max(jnp.abs(fars - 2.2))) < 0.05


def test_disarmed_fine_grid_keeps_coarse_bounds():
    """An all-empty fine grid must not collapse the NeuS bounds."""
    rb = _rays()
    coarse = _slab_grid()
    fine = OccupancyGrid.create(AABB, resolution=16)
    fine = fine.replace(binary=jnp.zeros((16,) * 3, bool))
    samples = voxel_surface_guided_samples(
        rb, coarse, fine, _sphere_sdf, rng=None,
        num_voxel_samples=10, num_samples=8, num_samples_importance=16,
        num_upsample_steps=2, coarse_probe_steps=128,
    )
    assert samples.starts.shape == (4, 10 + 8 + 16)
    # all samples inside the (slightly padded) coarse slab bounds
    assert float(jnp.min(samples.starts)) > 1.6
    assert float(jnp.max(samples.ends)) < 2.4


def test_armed_fine_grid_collapses_to_shell():
    """Once armed, NeuS samples live in ±margin around the first fine hit."""
    rb = _rays()
    coarse = _slab_grid()
    fine = _slab_grid(res=64, x_lo=-0.05, x_hi=0.05)  # thin surface at x≈0 → t≈2
    margin = 0.03
    samples = voxel_surface_guided_samples(
        rb, coarse, fine, _sphere_sdf, rng=None,
        num_voxel_samples=10, num_samples=8, num_samples_importance=16,
        num_upsample_steps=2, coarse_probe_steps=256,
        fine_shell_margin=margin,
    )
    starts = np.asarray(samples.starts)  # [4, 34]
    # the 24 NeuS samples (shell-bounded) must cluster near t=2 — at least
    # 24 of the 34 merged samples within the shell + probe quantization
    near_surface = np.abs(starts - 1.975) < (margin + 0.05)
    assert int(near_surface.sum(axis=-1).min()) >= 24


@pytest.mark.parametrize("rng_seed", [0, 1])
def test_perturbed_sampling_is_sorted_and_in_bounds(rng_seed):
    import jax

    rb = _rays()
    coarse = _slab_grid()
    fine = OccupancyGrid.create(AABB, resolution=16)
    fine = fine.replace(binary=jnp.zeros((16,) * 3, bool))
    samples = voxel_surface_guided_samples(
        rb, coarse, fine, _sphere_sdf, rng=jax.random.PRNGKey(rng_seed),
        num_voxel_samples=10, num_samples=8, num_samples_importance=16,
        num_upsample_steps=2, coarse_probe_steps=128,
    )
    starts = np.asarray(samples.starts)
    assert np.all(np.diff(starts, axis=-1) >= -1e-5)
