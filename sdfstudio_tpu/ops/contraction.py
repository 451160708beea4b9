"""Spatial distortions (unbounded-scene contraction).

Functional spec: reference nerfstudio/field_components/spatial_distortions.py:42-92
(MipNeRF-360 SceneContraction with L2 or L-inf norm). Implemented branch-free
with ``jnp.where`` so it jits to pure VPU elementwise work; the Gaussian
covariance path uses ``jax.vmap(jax.jacfwd(...))`` instead of functorch.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def contract(
    x: jnp.ndarray, order: Optional[float] = None, eps: float = 1e-12
) -> jnp.ndarray:
    """MipNeRF-360 contraction: identity for ||x|| <= 1 else
    (2 - 1/||x||) * x/||x||.

    Args:
        x: [..., 3] positions.
        order: None => L2 norm (sphere of radius 2); jnp.inf => L-inf
            (cube of side 4). Grid encodings want L-inf
            (spatial_distortions.py:56-58).
    """
    if order is None or order == 2:
        mag = jnp.linalg.norm(x, axis=-1, keepdims=True)
    elif order == jnp.inf or order == float("inf"):
        mag = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    else:
        mag = jnp.sum(jnp.abs(x) ** order, axis=-1, keepdims=True) ** (1.0 / order)
    safe_mag = jnp.maximum(mag, eps)
    contracted = (2.0 - 1.0 / safe_mag) * (x / safe_mag)
    return jnp.where(mag >= 1.0, contracted, x)


def contract_inv(
    y: jnp.ndarray, order: Optional[float] = None, eps: float = 1e-12
) -> jnp.ndarray:
    """Inverse contraction (needed to un-contract marching-cubes vertices,
    reference utils/marching_cubes.py:324-326). For ||y|| > 1:
    x = y/||y|| * 1/(2 - ||y||)."""
    if order is None or order == 2:
        mag = jnp.linalg.norm(y, axis=-1, keepdims=True)
    elif order == jnp.inf or order == float("inf"):
        mag = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    else:
        mag = jnp.sum(jnp.abs(y) ** order, axis=-1, keepdims=True) ** (1.0 / order)
    safe_mag = jnp.maximum(mag, eps)
    denom = jnp.maximum(2.0 - safe_mag, eps)
    inv = (y / safe_mag) / denom
    return jnp.where(mag > 1.0, inv, y)


def contract_gaussians(
    means: jnp.ndarray, covs: jnp.ndarray, order: Optional[float] = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Contract Gaussian (mean, cov) pairs; covariances transform by the
    contraction Jacobian outside the unit ball
    (spatial_distortions.py:76-91)."""

    def _f(x):
        if order is None or order == 2:
            mag = jnp.linalg.norm(x, axis=-1, keepdims=True)
        else:
            mag = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        return (2.0 - 1.0 / mag) * (x / mag)

    flat_means = means.reshape(-1, means.shape[-1])
    flat_covs = covs.reshape(-1, covs.shape[-1], covs.shape[-1])
    jac = jax.vmap(jax.jacfwd(_f))(flat_means)
    new_covs = jnp.einsum("nij,njk,nlk->nil", jac, flat_covs, jac)
    if order is None or order == 2:
        mag = jnp.linalg.norm(flat_means, axis=-1)
    else:
        mag = jnp.max(jnp.abs(flat_means), axis=-1)
    mask = (mag >= 1.0)[:, None, None]
    new_covs = jnp.where(mask, new_covs, flat_covs)
    return contract(means, order=order), new_covs.reshape(covs.shape)
