"""Math helpers: spherical harmonics, mip-NeRF Gaussians, expected_sin.

Functional spec: reference nerfstudio/utils/math.py:23-193. Pure jnp, so
everything fuses into the surrounding jit program.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


def components_from_spherical_harmonics(levels: int, directions: jnp.ndarray) -> jnp.ndarray:
    """Real SH basis values for each component up to ``levels`` bands
    (reference utils/math.py:23-84). Returns [..., levels**2]."""
    assert 1 <= levels <= 5, f"SH levels must be in [1,5], got {levels}"
    x, y, z = directions[..., 0], directions[..., 1], directions[..., 2]
    xx, yy, zz = x * x, y * y, z * z

    comps = [jnp.full_like(x, 0.28209479177387814)]
    if levels > 1:
        comps += [
            0.4886025119029199 * y,
            0.4886025119029199 * z,
            0.4886025119029199 * x,
        ]
    if levels > 2:
        comps += [
            1.0925484305920792 * x * y,
            1.0925484305920792 * y * z,
            0.9461746957575601 * zz - 0.31539156525251999,
            1.0925484305920792 * x * z,
            0.5462742152960396 * (xx - yy),
        ]
    if levels > 3:
        comps += [
            0.5900435899266435 * y * (3 * xx - yy),
            2.890611442640554 * x * y * z,
            0.4570457994644658 * y * (5 * zz - 1),
            0.3731763325901154 * z * (5 * zz - 3),
            0.4570457994644658 * x * (5 * zz - 1),
            1.445305721320277 * z * (xx - yy),
            0.5900435899266435 * x * (xx - 3 * yy),
        ]
    if levels > 4:
        comps += [
            2.5033429417967046 * x * y * (xx - yy),
            1.7701307697799304 * y * z * (3 * xx - yy),
            0.9461746957575601 * x * y * (7 * zz - 1),
            0.6690465435572892 * y * (7 * zz - 3),
            0.10578554691520431 * (35 * zz * zz - 30 * zz + 3),
            0.6690465435572892 * x * z * (7 * zz - 3),
            0.47308734787878004 * (xx - yy) * (7 * zz - 1),
            1.7701307697799304 * x * z * (xx - 3 * yy),
            0.4425326924449826 * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
        ]
    return jnp.stack(comps, axis=-1)


class Gaussians(NamedTuple):
    """Multivariate Gaussian (reference utils/math.py:87-97)."""

    mean: jnp.ndarray  # [..., dim]
    cov: jnp.ndarray  # [..., dim, dim]


def compute_3d_gaussian(
    directions: jnp.ndarray,
    means: jnp.ndarray,
    dir_variance: jnp.ndarray,
    radius_variance: jnp.ndarray,
) -> Gaussians:
    """Oriented 3D Gaussian along a ray (reference utils/math.py:100-125)."""
    dir_outer = directions[..., :, None] * directions[..., None, :]
    eye = jnp.eye(directions.shape[-1], dtype=directions.dtype)
    dir_mag_sq = jnp.clip(jnp.sum(directions**2, axis=-1, keepdims=True), 1e-10, None)
    null_outer = eye - directions[..., :, None] * (directions / dir_mag_sq)[..., None, :]
    cov = dir_variance[..., None] * dir_outer + radius_variance[..., None] * null_outer
    return Gaussians(mean=means, cov=cov)


def cylinder_to_gaussian(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    starts: jnp.ndarray,
    ends: jnp.ndarray,
    radius: jnp.ndarray,
) -> Gaussians:
    """Gaussian approximation of a cylinder (reference utils/math.py:128-150)."""
    means = origins + directions * ((starts + ends) / 2.0)
    dir_variance = (ends - starts) ** 2 / 12
    radius_variance = radius**2 / 4.0
    return compute_3d_gaussian(directions, means, dir_variance, radius_variance)


def conical_frustum_to_gaussian(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    starts: jnp.ndarray,
    ends: jnp.ndarray,
    radius: jnp.ndarray,
) -> Gaussians:
    """Stable mip-NeRF conical-frustum Gaussian (reference utils/math.py:153-179)."""
    mu = (starts + ends) / 2.0
    hw = (ends - starts) / 2.0
    means = origins + directions * (mu + (2.0 * mu * hw**2.0) / (3.0 * mu**2.0 + hw**2.0))
    dir_variance = (hw**2) / 3 - (4 / 15) * ((hw**4 * (12 * mu**2 - hw**2)) / (3 * mu**2 + hw**2) ** 2)
    radius_variance = radius**2 * ((mu**2) / 4 + (5 / 12) * hw**2 - 4 / 15 * (hw**4) / (3 * mu**2 + hw**2))
    return compute_3d_gaussian(directions, means, dir_variance, radius_variance)


def expected_sin(x_means: jnp.ndarray, x_vars: jnp.ndarray) -> jnp.ndarray:
    """E[sin(y)] for y ~ N(mean, var) (reference utils/math.py:182-193)."""
    return jnp.exp(-0.5 * x_vars) * jnp.sin(x_means)


def safe_normalize(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """L2-normalize along the last axis (F.normalize equivalent)."""
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def searchsorted_right(a: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched ``searchsorted(a, v, side="right")`` as a comparison count.

    ``a``: [..., N] sorted along the last axis; ``v``: [..., M] queries with
    matching batch dims. Returns int32 [..., M] insertion indices in [0, N].

    The vmapped ``jnp.searchsorted`` binary search lowers to a serial
    ``while`` per call site on TPU — the round-4 device trace measured
    ~64 ms/step across the PDF-sampler and interlevel-loss sites
    (docs/tpu-design.md "Round-4 state"). ``count(a <= v)`` is the same
    index (ties included) as one fused compare+reduce on the VPU.

    Size regime: the comparison count materializes an [..., N, M] tensor —
    O(N*M) per batch element vs binary search's O(M log N). At the sampler
    scale it lives at (N, M <= a few hundred) that tensor is tiny and the
    trade wins by ~62 ms/step on TPU; above ``_SEARCHSORTED_DENSE_LIMIT``
    comparisons per batch element (e.g. MC/visibility-grid paths hitting
    ~1e5-sized axes) it would silently cost O(N^2) memory, so this falls
    back to ``jnp.searchsorted`` (identical tie-inclusive indices,
    property-tested in tests/test_samplers.py).
    """
    n, m = a.shape[-1], v.shape[-1]
    if n * m > _SEARCHSORTED_DENSE_LIMIT:
        return jnp.searchsorted(a, v, side="right", method="sort").astype(jnp.int32) \
            if a.ndim == 1 else _searchsorted_batched(a, v)
    return jnp.sum(a[..., :, None] <= v[..., None, :], axis=-2, dtype=jnp.int32)


# Dense-comparison budget: 512*512 covers every sampler/loss site at 4x the
# reference's largest bin counts (256 proposal bins) while capping the
# comparison tensor at ~0.25M elements per batch element.
_SEARCHSORTED_DENSE_LIMIT = 512 * 512


def _searchsorted_batched(a: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched binary-search fallback for the large-axis regime."""
    import jax

    fn = lambda a1, v1: jnp.searchsorted(a1, v1, side="right").astype(jnp.int32)
    for _ in range(a.ndim - 1):
        fn = jax.vmap(fn)
    batch = jnp.broadcast_shapes(a.shape[:-1], v.shape[:-1])
    return fn(
        jnp.broadcast_to(a, batch + a.shape[-1:]),
        jnp.broadcast_to(v, batch + v.shape[-1:]),
    )
